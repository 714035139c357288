"""``python -m osm_chordify_spark`` → the CLI facade (cli.py)."""

import sys

from osm_chordify_spark.cli import main

sys.exit(main())
