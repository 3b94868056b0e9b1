"""``python -m bootstrapper_tpu`` — same entry as the ``bs`` script."""

from .cli.main import cli

if __name__ == "__main__":
    cli()
