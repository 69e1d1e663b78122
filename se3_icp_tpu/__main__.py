from se3_icp_tpu.cli import main

main()
