"""CLI surface (the runqc|sampleqc|help analogue, longQC.py:876-954):
argument wiring + preset registry. The heavy subcommands own their own
Ray session, so the e2e path is exercised out-of-process by the bench
and verify drives; here we pin the pieces that don't need a session.
"""

import pytest


def test_list_runs_without_ray(capsys):
    from longqc_ray.__main__ import main

    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "sql-checked" in out
    assert "presets: cohort, default, lenient, strict" in out
    # every query name appears
    import __ray_entry__ as entrymod

    for name in entrymod.queries():
        assert name in out


def test_presets_registry():
    from longqc_ray.config import DEFAULT_CONFIG, PRESETS

    assert PRESETS["default"] is DEFAULT_CONFIG
    assert PRESETS["strict"].snr_min_db > DEFAULT_CONFIG.snr_min_db
    assert PRESETS["strict"].lang_min_conf > DEFAULT_CONFIG.lang_min_conf
    assert PRESETS["lenient"].ppl_max > DEFAULT_CONFIG.ppl_max


def test_unknown_preset_rejected():
    from longqc_ray.__main__ import _config_for

    with pytest.raises(SystemExit):
        _config_for("nope")


def test_unknown_query_rejected():
    from longqc_ray.__main__ import main

    with pytest.raises(SystemExit):
        main(["query", "definitely_not_a_query"])


def test_address_resolution(monkeypatch):
    """ray-job-submit contract: explicit flag > $RAY_ADDRESS (the job
    runtime sets it to the cluster address) > fresh local session."""
    from longqc_ray.__main__ import _resolve_address

    monkeypatch.delenv("RAY_ADDRESS", raising=False)
    assert _resolve_address(None) == "local"
    assert _resolve_address("auto") == "auto"
    monkeypatch.setenv("RAY_ADDRESS", "ray://head:10001")
    assert _resolve_address(None) == "ray://head:10001"
    assert _resolve_address("local") == "local"
    monkeypatch.setenv("RAY_ADDRESS", "")  # empty = unset (sandbox quirk)
    assert _resolve_address(None) == "local"


def test_segment_subcommand_wiring(monkeypatch):
    """`segment` parses its flags THROUGH main's real parser and routes
    to cmd_segment with the parsed values (the e2e path — manifest,
    resume — is pinned in test_resume.py)."""
    import longqc_ray.__main__ as cli

    # missing required args → argparse SystemExit, not a crash
    with pytest.raises(SystemExit):
        cli.main(["segment"])

    seen = {}

    def fake_cmd(args):
        seen.update(vars(args))
        return 0

    # set_defaults(fn=cmd_segment) resolves the module global at
    # main() call time, so patching the module routes the dispatch
    monkeypatch.setattr(cli, "cmd_segment", fake_cmd)
    rc = cli.main([
        "segment", "--input", "/x", "--out", "/y",
        "--shards-per-unit", "7", "--min-dur-ms", "250",
    ])
    assert rc == 0
    assert seen["input"] == "/x" and seen["out"] == "/y"
    assert seen["shards_per_unit"] == 7 and seen["min_dur_ms"] == 250
    assert seen["cpus"] is None and seen["address"] is None
