import numpy as np
from click.testing import CliRunner

from bootstrapper_tpu.cli import cli
from bootstrapper_tpu.core.arrays import prepare_ds


def test_prepare_wizard_interactive(tmp_path):
    """Drive the volume/model prompts exactly as a terminal user."""
    ds = prepare_ds(
        str(tmp_path / "w.zarr/raw"), (4, 16, 16), (0, 0, 0), (40, 4, 4),
        np.uint8,
    )
    ds[ds.roi] = 1
    lab = prepare_ds(
        str(tmp_path / "w.zarr/labels"), (4, 16, 16), (0, 0, 0), (40, 4, 4),
        np.uint32,
    )
    lab[lab.roi] = 1

    answers = "\n".join([
        "vol1",                          # volume name
        str(tmp_path / "w.zarr/raw"),    # raw path
        str(tmp_path / "w.zarr/labels"), # labels
        "",                              # no mask
        str(tmp_path / "w.zarr"),        # container
        "",                              # finish volumes
        "0",                             # first model chain
    ]) + "\n"
    runner = CliRunner()
    res = runner.invoke(
        cli,
        ["prepare", "-b", str(tmp_path), "-r", "r1",
         "--max-iterations", "5"],
        input=answers,
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output
    assert (tmp_path / "r1/02_predict.toml").exists()
