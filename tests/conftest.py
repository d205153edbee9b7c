from __future__ import annotations

import pytest

from rsbsa_etl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="rsbsa_tests", cpus=4, shuffle_partitions=8)
    yield s
    s.stop()


SF_DIR = "/root/testdata/sf0.001"
SF01_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def gen_sf01_dir() -> str:
    """the independently-generated sf0.01 fixture for the
    dataset-independence parity suite — GENERATED ON DEMAND (r11
    verdict item 4: the suite used to auto-skip its 26 keys whenever
    /tmp/sfgen was absent, so on a fresh machine the "matches the
    oracle as a function, not on one input" coverage silently
    vanished). tools/gen_sf.py at sf0.01 is a <1 s one-off; reuse an
    existing directory (same seed → same bytes, and regeneration
    would invalidate nothing anyway)."""
    import subprocess
    import sys
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    out = "/tmp/sfgen/sf0.01"
    if not (Path(out) / "documents.parquet").exists():
        subprocess.run(
            [sys.executable, str(root / "tools" / "gen_sf.py"),
             "--sf", "0.01", "--out", out, "--skew"],
            check=True, cwd=str(root), capture_output=True,
        )
    return out
