"""Every CLI driver's argument parser must at least construct and answer
--help (catches duplicate/conflicting flag registrations, which argparse
raises at parser-build time — a failure mode the deeper pipeline tests miss
because they call main() with module-specific argv)."""

from __future__ import annotations

import pytest

CLI_MODULES = [
    "partition",
    "train",
    "auto_train",
    "render",
    "metrics",
    "merge",
    "full_eval",
    "convert",
    "light",
]


@pytest.mark.parametrize("name", CLI_MODULES)
def test_cli_help(name):
    import importlib

    mod = importlib.import_module(f"pcp_tpu.cli.{name}")
    with pytest.raises(SystemExit) as e:
        mod.main(["--help"])
    assert e.value.code == 0
