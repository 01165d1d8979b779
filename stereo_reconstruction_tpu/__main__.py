from stereo_reconstruction_tpu.cli import main

main()
