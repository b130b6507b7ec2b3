from .trex import main
import sys
sys.exit(main())
