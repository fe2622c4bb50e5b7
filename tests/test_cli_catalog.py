"""The `python -m eeg2video_tpu` catalog/dispatcher covers every CLI module."""

import pathlib

import pytest

from eeg2video_tpu.__main__ import COMMANDS, main


def test_catalog_covers_every_cli_module():
    cli_dir = pathlib.Path(__file__).parent.parent / "eeg2video_tpu" / "cli"
    mods = {p.stem for p in cli_dir.glob("*.py")} - {"__init__"}
    assert {c for c, _, _ in COMMANDS} == mods


def test_usage_listing(capsys):
    assert main([]) == 0
    out = capsys.readouterr().out
    for cmd, _, _ in COMMANDS:
        assert cmd in out


def test_unknown_command():
    assert main(["not_a_command"]) == 2


def test_dispatch_help_exits_zero():
    with pytest.raises(SystemExit) as e:
        main(["run_metrics", "--help"])
    assert e.value.code == 0
