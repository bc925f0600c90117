"""Behavioral pins for the r14 query-level operators beyond the
DuckDB differential: properties a green hash-match could in principle
satisfy vacuously (zero orphans, never-pruned candidate sets, a
mixture that keeps everything, a FIM pass that never fires) are
asserted against independent arithmetic here."""

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.fixture(scope="module")
def entry():
    import __spark_entry__ as M

    return M


def test_dpo_pack_invariants(spark, entry, sf_dir):
    """Per block: the symbol stream's side/mask arithmetic must be
    self-consistent, orphans bounded by samples, and the fixture must
    exercise BOTH populations (complete pairs and orphans) — a DPO
    pack audit with no orphans pinned nothing."""
    rows = entry.q_dpo_pack_docs(spark, sf_dir).collect()
    assert rows
    tot_samples = sum(r["n_samples"] for r in rows)
    tot_orphans = sum(r["n_orphans"] for r in rows)
    assert 0 < tot_orphans < tot_samples
    # complete pairs exist and pair arithmetic closes: kept samples
    # minus orphans must be even (they pair up)
    assert (tot_samples - tot_orphans) % 2 == 0
    assert tot_samples - tot_orphans > 0
    for r in rows:
        assert 0 <= r["n_orphans"] <= r["n_samples"]
        assert r["n_chosen_loss"] + r["n_rejected_loss"] <= r["n_syms"]
    # both sides carry loss mass somewhere (chosen AND rejected
    # responses actually packed)
    assert sum(r["n_chosen_loss"] for r in rows) > 0
    assert sum(r["n_rejected_loss"] for r in rows) > 0


def test_ivfadc_recall_bound_ranges(spark, entry, sf_dir):
    """The instrument's columns must be consistent: counts are
    recall·5, recalls in [0,1], and the pruned search cannot beat
    the unpruned ADC on average by construction noise alone — the
    vs-ADC column must show SOME agreement (the pruning keeps the
    nearest cells, not random ones)."""
    rows = entry.q_ivfadc_recall_bound(spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        assert 0 <= r["recall_exact"] <= 1
        assert 0 <= r["recall_adc"] <= 1
        assert r["n_exact"] == round(r["recall_exact"] * 5)
        assert r["n_adc"] == round(r["recall_adc"] * 5)
    assert sum(r["n_adc"] for r in rows) > 0


def test_byte_fallback_fixture_roundtrips_exactly(spark, entry, sf_dir):
    """Every doc (with the non-Latin + emoji suffix) must decode back
    to its NFC form EXACTLY, and the fallback count must be positive
    everywhere (the suffix guarantees multibyte work per doc)."""
    rows = entry.q_bpe_byte_fallback_docs(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["exact"] == 1, r
        assert r["n_fallback"] > 0, r
        assert r["n_ids"] > r["n_fallback"]


def test_curation_v9_mixture_and_fim_actually_fire(spark, entry, sf_dir):
    """v9's tail stages must do real work on the fixture: the packed
    id stream must contain FIM sentinels (the transform fired) and
    the block count must be well below v8's (decontamination +
    mixture dropped docs)."""
    v9 = entry.q_pipeline_curation_v9(spark, sf_dir).collect()
    v8 = entry.q_pipeline_curation_v8(spark, sf_dir).collect()
    assert v9 and v8
    assert len(v9) < len(v8), (len(v9), len(v8))
    heads = ",".join(r["head_ids"] for r in v9)
    assert "9001" in heads or "9002" in heads or "9003" in heads
    # stream is gapless 32-id blocks except the tail
    sizes = [r["n_ids"] for r in v9]
    assert all(s == 32 for s in sizes[:-1])


def test_mixture_epochs_both_regimes_fire(spark, entry, sf_dir):
    """The 60k budget must exercise BOTH regimes on the fixture:
    the head source upsamples (epochs >= 1) and the tail source
    downsamples (epochs == 0 with a partial remainder), and the
    realized token mass tracks the integer plan exactly."""
    rows = {r["source"]: r for r in
            entry.q_mixture_epochs_docs(spark, sf_dir).collect()}
    assert set(rows) == {"src0", "src1", "src2", "src3"}
    assert rows["src0"]["epochs"] >= 1
    assert rows["src3"]["epochs"] == 0
    assert 0 < rows["src3"]["rem_millis"] < 1000
    for r in rows.values():
        assert r["total_toks"] == r["epochs"] * r["toks"] + r["rem_toks"]
        assert 0 <= r["rem_millis"] < 1000
        assert r["rem_docs"] <= r["n_docs"]
