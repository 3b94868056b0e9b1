import pytest

from bootstrapper_tpu.utils import tomlio


def test_roundtrip_scalars_and_lists():
    data = {
        "name": "x",
        "count": 3,
        "rate": 0.5,
        "flag": True,
        "shape": [1, 2, 3],
        "nested_list": [[1, 2], [3, 4]],
    }
    assert tomlio.loads(tomlio.dumps(data)) == data


def test_roundtrip_tables_and_dotted_subtables():
    data = {
        "train": {
            "setup_dir": "a/b",
            "voxel_size": [40, 4, 4],
            "pred": {"params": {"sigma": 80}},
        }
    }
    out = tomlio.loads(tomlio.dumps(data))
    assert out == data


def test_array_of_tables():
    data = {
        "train": {
            "samples": [
                {"raw": "a", "labels": "b"},
                {"raw": "c", "labels": "d"},
            ]
        }
    }
    assert tomlio.loads(tomlio.dumps(data)) == data


def test_none_dropped():
    text = tomlio.dumps({"a": 1, "b": None})
    assert "b" not in text


def test_string_escaping():
    data = {"path": 'we"ird\\name'}
    assert tomlio.loads(tomlio.dumps(data)) == data


def test_file_roundtrip(tmp_path):
    p = str(tmp_path / "x.toml")
    data = {"volumes": {"v1": {"raw_dataset": "r", "voxel_size": [1, 1, 1]}}}
    tomlio.dump(data, p)
    assert tomlio.load(p) == data
