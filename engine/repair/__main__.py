import sys

from .api import cli

if __name__ == "__main__":
    sys.exit(cli())
