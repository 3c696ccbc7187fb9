"""Unit tests for experiments/rd_trajectory.py (marathon-log parsing).

The marathon log format is produced by experiments/rd_continue.py
(eval blocks) and scripts/rd_marathon.sh (cycle/start markers).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "experiments"))

import rd_trajectory  # noqa: E402

SAMPLE = """\
=== marathon start Mon Aug 17 20:51:22 UTC 2026 ===
[performance] step 0: loss 0.2 bpp 1.2 psnr 6.0 (96s)
[performance] bpp=[0.1, 0.2]
[performance] psnr=[10.0, 10.1]
[performance] roi=[9.0, 9.1]
=== continue cycle 1 done Mon Aug 17 21:00:00 UTC 2026 rc=0 ===
=== marathon start Tue Aug 18 00:37:12 UTC 2026 (recon-skip recipe) ===
[performance+] bpp=[0.04, 0.15]
[performance+] psnr=[21.0, 21.5]
[performance+] roi=[14.0, 14.2]
[plain+] bpp=[0.05, 0.21]
[plain+] psnr=[20.2, 20.7]
[plain+] roi=[13.5, 13.5]
=== continue cycle 1 done Tue Aug 18 02:25:55 UTC 2026 rc=0 ===
[performance+] bpp=[0.04, 0.14]
[performance+] psnr=[21.2, 21.9]
[performance+] roi=[14.1, 14.4]
=== continue cycle 2 done Tue Aug 18 04:13:33 UTC 2026 rc=0 ===
"""


@pytest.fixture()
def logfile(tmp_path):
    p = tmp_path / "rd_marathon.log"
    p.write_text(SAMPLE)
    return str(p)


def test_parse_keeps_only_latest_marathon_epoch(logfile):
    cycles = rd_trajectory.parse(logfile)
    # the 20:51 epoch's cycle must be dropped (superseded recipe)
    assert [c["cycle"] for c in cycles] == [1, 2]
    assert cycles[0]["when"].startswith("Tue Aug 18 02:25:55")


def test_parse_strips_plus_suffix_and_collects_all_keys(logfile):
    cycles = rd_trajectory.parse(logfile)
    v = cycles[0]["variants"]
    assert set(v) == {"performance", "plain"}
    assert v["performance"]["psnr"] == [21.0, 21.5]
    assert v["plain"]["roi"] == [13.5, 13.5]


def test_summarize_separation_and_roi_gap(logfile):
    cycles = rd_trajectory.parse(logfile)
    rows = rd_trajectory.summarize(cycles)
    r1 = rows[0]
    assert r1["performance_qp_separation_db"] == pytest.approx(0.5)
    assert r1["performance_psnr_qp56"] == pytest.approx(21.5)
    # mean over the sweep: (14.0-13.5 + 14.2-13.5)/2
    assert r1["roi_gap_db"] == pytest.approx(0.6)
    # cycle 2 has no plain eval -> no roi_gap key, no crash
    assert "roi_gap_db" not in rows[1]


def test_summarize_handles_missing_eval_block(logfile):
    cycles = rd_trajectory.parse(logfile)
    rows = rd_trajectory.summarize(cycles)
    assert rows[1]["performance_qp_separation_db"] == pytest.approx(0.7)
    assert "plain_psnr_qp56" not in rows[1]
