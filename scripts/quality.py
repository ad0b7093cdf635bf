"""Regenerate the committed quality artifact (QUALITY.md + quality.json).

Pinned midscale simulation (seed 1234: 100 log-normal-abundance
transcripts x 1500bp, 20x mean coverage, 100bp reads, 1% error) ->
assemble (device backend; runs on CPU or TPU) -> eval.evaluate recall/
precision -> artifact.  Tracked per round so quality regressions are
visible in review (VERDICT r1 item 8 / 'Committed quality evidence').

    PYTHONPATH=. python scripts/quality.py [--backend device|oracle]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SEED = 1234
N_TRANSCRIPTS = 100
T_LEN = 1500
COVERAGE = 20.0
READ_LEN = 100
ERROR_RATE = 0.01


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="device",
                    choices=["device", "oracle"])
    ap.add_argument("--paired", action="store_true",
                    help="paired-end variant (insert 300)")
    args = ap.parse_args()

    from shannon_tpu.config import AssemblyConfig
    from shannon_tpu.eval import evaluate
    from shannon_tpu.pipeline import assemble
    from shannon_tpu.sim import (
        sample_paired_reads,
        sample_reads,
        simulate_transcripts,
    )

    rng = np.random.default_rng(SEED)
    abund = np.exp(rng.normal(0, 1, N_TRANSCRIPTS))
    abund = (abund / abund.mean()).tolist()
    truth = simulate_transcripts(rng, n=N_TRANSCRIPTS, length=T_LEN)
    if args.paired:
        reads = sample_paired_reads(
            rng, truth, abundances=abund, coverage=COVERAGE,
            read_length=READ_LEN, insert_size=300, error_rate=ERROR_RATE,
        )
    else:
        reads = sample_reads(
            rng, truth, abundances=abund, coverage=COVERAGE,
            read_length=READ_LEN, error_rate=ERROR_RATE,
        )

    cfg = AssemblyConfig(kmer_capacity=1 << 20)
    t0 = time.perf_counter()
    res = assemble(reads, cfg, backend=args.backend, paired=args.paired)
    wall = time.perf_counter() - t0
    metrics = evaluate(truth, [t.seq for t in res.transcripts], k=cfg.k)

    payload = {
        "dataset": {
            "seed": SEED,
            "n_transcripts": N_TRANSCRIPTS,
            "transcript_length": T_LEN,
            "coverage_mean": COVERAGE,
            "read_length": READ_LEN,
            "error_rate": ERROR_RATE,
            "n_reads": len(reads),
            "paired": args.paired,
            "abundances": "log-normal(0, 1), mean-normalized",
        },
        "backend": args.backend,
        "wall_s": round(wall, 1),
        "metrics": metrics,
        "assembly_stats": res.stats,
    }
    (REPO / "quality.json").write_text(json.dumps(payload, indent=2) + "\n")

    md = f"""# Quality — pinned midscale simulation

Regenerate with `PYTHONPATH=. python scripts/quality.py` (any backend,
CPU or TPU — output is backend-independent by the parity contract).

**Dataset (pinned):** seed {SEED}, {N_TRANSCRIPTS} random transcripts x
{T_LEN}bp, log-normal abundances, {COVERAGE:.0f}x mean coverage,
{READ_LEN}bp single-end reads, {ERROR_RATE:.0%} error rate ->
{len(reads)} reads.

**Metrics** (shannon_tpu.eval: exact = transcript recovered verbatim up
to RC; partial = >=95% of its k-mers present; precision = assembled
transcripts matching truth):

| metric | value |
|---|---|
| recall (exact) | {metrics['recall_exact']:.1%} |
| recall (exact + partial) | {metrics['recall_partial']:.1%} |
| precision | {metrics['precision']:.1%} |
| transcripts assembled | {metrics['n_assembled']} |
| truth transcripts | {metrics['n_truth']} |

Assembly stats: {res.stats['n_kmers_final']} corrected k-mers,
{res.stats['n_contigs']} contigs, {res.stats['n_components']}
components, {res.stats['n_mb_splits']} MB splits,
{res.stats['n_sf_splits']} SF splits.

*(backend: {args.backend}, wall {wall:.1f}s on this machine — timing is
informational only; BENCH_r*.json carries the performance numbers)*
"""
    (REPO / "QUALITY.md").write_text(md)
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
