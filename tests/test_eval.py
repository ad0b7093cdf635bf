"""Evaluator tests."""

from shannon_tpu.eval import evaluate
from shannon_tpu.io.dna import revcomp_str
from shannon_tpu.sim import random_seq, simulate_transcripts


def test_evaluate_exact(rng):
    ts = simulate_transcripts(rng, n=3, length=300)
    res = evaluate(ts, [revcomp_str(ts[0]), ts[1], ts[2]], k=21)
    assert res["exact_recovered"] == 3
    assert res["recall_exact"] == 1.0
    assert res["precision"] == 1.0


def test_evaluate_partial_and_junk(rng):
    ts = simulate_transcripts(rng, n=2, length=300)
    frag = ts[0][:290]  # fragment: partial recovery of t0
    junk = random_seq(rng, 300)
    res = evaluate(ts, [frag, ts[1], junk], k=21)
    assert res["exact_recovered"] == 1
    assert res["partial_recovered"] == 1
    assert res["recall_partial"] == 1.0
    assert res["precision"] == round(2 / 3, 4)


def test_evaluate_empty():
    res = evaluate([], [], k=21)
    assert res["n_truth"] == 0 and res["precision"] == 0.0
