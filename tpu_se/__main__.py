import sys

from tpu_se.cli.main import main

sys.exit(main())
