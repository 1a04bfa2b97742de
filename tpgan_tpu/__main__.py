"""``python -m tpgan_tpu`` -> the CLI."""

import sys

from tpgan_tpu.cli import main

sys.exit(main())
