"""``bs doctor`` environment diagnosis."""

import json

from click.testing import CliRunner

from bootstrapper_tpu.cli.main import cli


def test_doctor_host_checks_pass():
    r = CliRunner().invoke(cli, ["doctor", "--skip-device", "--json"])
    assert r.exit_code == 0, r.output
    results = json.loads(r.output.strip().splitlines()[-1])
    for check in ("versions", "compile-cache", "native", "storage",
                  "mesh", "knobs"):
        assert check in results, results.keys()
        assert results[check]["level"] in ("ok", "warn"), results[check]
    assert "device" not in results


def test_doctor_styled_output():
    r = CliRunner().invoke(cli, ["doctor", "--skip-device"])
    assert r.exit_code == 0, r.output
    assert "native" in r.output and "storage" in r.output


def test_doctor_reports_knobs(monkeypatch):
    monkeypatch.setenv("BS_XLA_OPTS", "xla_tpu_scoped_vmem_limit_kib=32768")
    r = CliRunner().invoke(cli, ["doctor", "--skip-device", "--json"])
    results = json.loads(r.output.strip().splitlines()[-1])
    assert "BS_XLA_OPTS" in results["knobs"]["message"]
