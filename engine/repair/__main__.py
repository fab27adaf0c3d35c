"""Module entry point: ``python -m engine.repair [file] [options]``."""

from engine.repair.api import cli

raise SystemExit(cli())
