"""``python -m bootstrapper_tpu.cli`` — same entry as the ``bs`` script."""

from .main import cli

if __name__ == "__main__":
    cli()
