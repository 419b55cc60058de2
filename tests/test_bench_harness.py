"""Harness-behavior regression tests for bench.py.

Round 4's driver bench was lost to a harness defect (one end-of-run JSON
line, killed before it printed), not an engine defect — so the fail-soft
campaign structure itself is under test: every section must emit a
complete JSON line, the adaptive top-up loop must re-sample noisy legs
symmetrically, and the budget guards must degrade by skipping sections
rather than dying.  All batches are faked (no Spark, no subprocesses):
the test drives ``bench.main()`` end-to-end through its real control
flow in milliseconds.
"""

from __future__ import annotations

import importlib
import json
import sys

import pytest


@pytest.fixture()
def bench_mod(monkeypatch):
    sys.path.insert(0, "/root/repo")
    import bench

    importlib.reload(bench)
    # no real datagen, no catalog Spark session, no fast tier
    monkeypatch.setattr(bench, "_materialize_docs_isolated", lambda n: None)
    monkeypatch.setattr(bench, "BENCH_QUERIES", [])
    monkeypatch.setattr(bench, "_fast_tier_queries", lambda: [])
    import hashio_spark.session as hs

    class _FakeCatalog:
        def clearCache(self):
            pass

    class _FakeSpark:
        catalog = _FakeCatalog()

        def stop(self):
            pass

    monkeypatch.setattr(hs, "get_spark", lambda **kw: _FakeSpark())
    return bench


def _drive(bench, monkeypatch, capsys, seq, budget=10_000):
    """Run main() with scripted per-topology batch walls; return emitted lines."""
    idx: dict[str, int] = {}

    def fake_batch(cores, n, algo=None, max_retries=8):
        k = str(cores)
        i = idx.get(k, 0)
        idx[k] = i + 1
        walls = list(seq[k][min(i, len(seq[k]) - 1)])
        return {"wall": walls, "cpu": [w * 1.2 for w in walls]}

    monkeypatch.setattr(bench, "_run_batch_isolated", fake_batch)
    monkeypatch.setattr(bench, "BUDGET_S", budget)
    bench.main()
    out = capsys.readouterr().out
    lines = [json.loads(ln) for ln in out.splitlines() if ln.startswith("{")]
    assert lines, "main() must print at least one JSON line"
    return lines, idx


CLEAN = {  # efficiency ≥ 0.86 immediately: (100/4)/25 → 1.0
    "1": [[101.0], [100.0, 102.0]],
    "4": [[25.5], [25.0, 26.0]],
    "2": [[52.0, 53.0]],
    "8": [[13.5, 14.0]],
}

NOISY_BIG = {  # first two 4-core passes in a bad window, third clean
    "1": [[90.0], [85.0, 86.0], [85.5], [85.2]],
    "4": [[31.0], [31.5, 34.0], [25.0]],
    "2": [[46.0, 47.0]],
    "8": [[14.0, 15.0]],
}


def test_every_section_emits_complete_line(bench_mod, monkeypatch, capsys):
    lines, _ = _drive(bench_mod, monkeypatch, capsys, CLEAN)
    # provisional primary, alt, post-top-up, catalog — each a full parse
    assert len(lines) >= 3
    for ln in lines:
        assert "scaling" in ln and "flagship" in ln
    assert "scaling_alt" in lines[-1]
    # monotone growth: later lines never lose sections
    assert set(lines[0]) <= set(lines[-1])


def test_clean_run_skips_all_topups(bench_mod, monkeypatch, capsys):
    _, idx = _drive(bench_mod, monkeypatch, capsys, CLEAN)
    # primary reads 0.990 ∈ [0.86, 1.02] and alt reads 0.963 ≥ 0.8 off the
    # initial batches — no top-up round spends budget re-sampling them
    assert idx["1"] == 1 and idx["4"] == 1
    assert idx["2"] == 1 and idx["8"] == 1


SUPERLINEAR = {  # poisoned 1-core min: eff reads (140/25)/4 = 1.4 > 1.02
    "1": [[140.0], [101.0], [100.5]],
    "4": [[25.5], [25.0], [25.2]],
    "2": [[52.0, 53.0]],
    "8": [[13.5, 14.0]],
}


def test_superlinear_primary_read_is_challenged(bench_mod, monkeypatch, capsys):
    # an efficiency ABOVE the sane band means the small leg is suspect —
    # top-ups must run (symmetrically) until the read returns to the band
    lines, idx = _drive(bench_mod, monkeypatch, capsys, SUPERLINEAR)
    assert idx["1"] == idx["4"] == 2
    # one round rescues the small min to 101.0 → (101/25)/4 = 1.01, back
    # inside the band — the loop stops there instead of burning budget
    assert lines[-1]["scaling"]["efficiency"] == round((101.0 / 25.0) / 4, 3)


NOISY_ALT = {  # clean primary; first 8-core alt batch in a bad window
    "1": [[100.0, 102.0]],
    "4": [[25.0, 26.0]],
    "2": [[52.0, 53.0], [51.5]],
    "8": [[29.0, 27.5], [14.0]],
}


def test_noisy_alt_leg_triggers_symmetric_topups(bench_mod, monkeypatch, capsys):
    lines, idx = _drive(bench_mod, monkeypatch, capsys, NOISY_ALT)
    # primary clean → untouched; alt reads (52/27.5)/4 = 0.473 → one
    # symmetric top-up round rescues it to (51.5/14)/4 = 0.920
    assert idx["1"] == 1 and idx["4"] == 1
    assert idx["2"] == 2 and idx["8"] == 2
    assert lines[-1]["scaling_alt"]["efficiency"] == round((51.5 / 14.0) / 4, 3)


def test_stretch_ref_carried_with_provenance(bench_mod, monkeypatch, capsys):
    # the committed 12M BENCH_FULL campaign is quoted in every emit with
    # an explicit NOT-measured-in-this-run provenance label
    lines, _ = _drive(bench_mod, monkeypatch, capsys, CLEAN)
    for ln in lines:
        ref = ln["scaling_at_12m_ref"]
        assert "NOT measured in this run" in ref["source"]
        assert ref["scaling"]["efficiency"] >= 0.8
        assert ref["scaling_alt"]["efficiency"] >= 0.8


def test_noisy_leg_triggers_symmetric_topups(bench_mod, monkeypatch, capsys):
    lines, idx = _drive(bench_mod, monkeypatch, capsys, NOISY_BIG)
    # provisional read is bad, adaptive rounds re-sample BOTH legs until
    # the 4-core min escapes the noisy window
    assert idx["1"] == idx["4"], "top-ups must stay symmetric across legs"
    assert idx["4"] >= 3
    final = lines[-1]["scaling"]
    assert final["seconds_big"] == 25.0
    assert final["efficiency"] == round((85.0 / 25.0) / 4, 3)
    # every emitted efficiency is derived from the mins recorded so far
    for ln in lines:
        s = ln["scaling"]
        assert s["efficiency"] == round(
            (min(s["samples_small"]) / min(s["samples_big"])) / 4, 3
        )


def test_exhausted_budget_still_prints_primary(bench_mod, monkeypatch, capsys):
    # budget so tight that alt/top-ups/catalog all self-skip — the
    # binding primary pair must still be on record (the round-4 lesson)
    lines, idx = _drive(bench_mod, monkeypatch, capsys, CLEAN, budget=0.001)
    assert idx["1"] == 1 and idx["4"] == 1
    assert "2" not in idx and "8" not in idx
    final = lines[-1]
    # only the first batch of each leg ran: (101.0 / 25.5) / 4
    assert final["scaling"]["efficiency"] == round((101.0 / 25.5) / 4, 3)
    assert "scaling_alt" not in final
