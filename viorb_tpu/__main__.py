from viorb_tpu.run import main

main()
