from tpufem.cli import main

main()
