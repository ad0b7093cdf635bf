"""Multi-process `jax.distributed` smoke test (CPU backend) — SURVEY.md §8
M5, BASELINE row 3; extended per VERDICT r3 item 2 (full pipeline,
FASTA to FASTA) and VERDICT r4 item 3 (component-ownership back half,
proven on 2 AND 4 processes with a measured communication-volume
comparison against the all-gather mode).

Each child process:

  * `init_distributed` runs `jax.distributed.initialize` (coordinator
    env vars set by the parent);
  * byte-range-ingests ITS 1/N of one FASTA (`host_byte_range` +
    `native.pack_file_range` — a record belongs to the range holding
    its header byte, so every read lands on exactly one process);
  * runs the sharded count (`count_spectrum_sharded`, hash all_to_all +
    merge) over the N-process global mesh and asserts the replicated
    merged spectrum equals the single-process oracle spectrum;
  * runs the FULL `run_pipeline` TWICE — multihost_backhalf='ownership'
    (evidence routed to component owners with one all_to_all, each host
    assembles only owned components, transcripts union-gathered) and
    ='replicate' (the r4 all-gather-everything mode) — asserting
    transcript-set parity (up to RC) with the single-process oracle
    assembly for BOTH; process 0's written transcripts.fasta is checked
    by the parent too.

Parent mode (no args): simulates the dataset, launches a 2-process
group (both modes) then a 4-process group (ownership), collects
results + the ownership-vs-replicate communication volumes from
stats.json, writes MULTIHOST_SMOKE.json at the repo root.
Child mode: SMOKE_ROLE=child + coordinator env (set by the parent).
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))
K = 24
PAD = 64  # explicit pad: multi-host ingest requires pinned shapes


def child() -> None:
    from shannon_tpu.parallel.multihost import host_byte_range, init_distributed

    ok = init_distributed()
    import jax

    assert ok, "init_distributed did not go multi-process"
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_expected = int(os.environ["JAX_NUM_PROCESSES"])
    assert jax.process_count() == n_expected, jax.process_count()
    pid = jax.process_index()

    from shannon_tpu.native import pack_file_range
    from shannon_tpu.parallel.distributed import count_spectrum_sharded
    from shannon_tpu.parallel.mesh import READS_AXIS, make_mesh

    fasta = os.environ["SMOKE_FASTA"]
    lo, hi = host_byte_range(fasta)
    batch = pack_file_range(fasta, lo, hi, pad_length=PAD)
    n_local = batch.n_reads

    # equalize per-host rows for uniform shards (pad rows have no windows)
    counts = multihost_utils.process_allgather(np.array([n_local]))
    n_max = int(counts.max())
    codes = np.pad(
        batch.codes, ((0, n_max - n_local), (0, 0)), constant_values=4
    )
    lengths = np.pad(batch.lengths, (0, n_max - n_local)).astype(np.int32)

    mesh = make_mesh()
    gcodes = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(READS_AXIS, None)), codes
    )
    glengths = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(READS_AXIS)), lengths
    )
    spec, ovf = count_spectrum_sharded(
        gcodes, glengths, K, capacity=1 << 15, mesh=mesh
    )
    assert not bool(ovf), "sharded count overflowed"

    n = int(spec.n)
    hi_a = np.asarray(spec.hi)[:n].astype(np.uint64)
    lo_a = np.asarray(spec.lo)[:n].astype(np.uint64)
    keys = (hi_a << np.uint64(32)) | lo_a
    cnts = np.asarray(spec.count)[:n]

    exp = np.load(os.environ["SMOKE_EXPECTED"])
    assert np.array_equal(keys, exp["kmers"]), (
        f"proc {pid}: merged spectrum keys != single-process oracle "
        f"({n} vs {len(exp['kmers'])})"
    )
    assert np.array_equal(cnts, exp["counts"]), f"proc {pid}: counts differ"

    # ---- phase 2: FULL pipeline, FASTA to FASTA, both back-half modes
    from shannon_tpu.config import AssemblyConfig
    from shannon_tpu.io.dna import revcomp_str
    from shannon_tpu.pipeline import run_pipeline

    exp_t = set(
        json.loads(Path(os.environ["SMOKE_EXPECTED_T"]).read_text())
    )
    n_t = {}
    for mode in ("ownership", "replicate"):
        out_dir = Path(os.environ["SMOKE_OUT"]) / f"pipeline_{mode}"
        cfg = AssemblyConfig(
            k=K,
            kmer_capacity=1 << 15,
            out_dir=str(out_dir),
            read_pad_length=PAD,
            min_transcript_length=200,
            multihost_backhalf=mode,
        )
        res = run_pipeline(cfg, single=fasta, backend="device")
        got = {min(t.seq, revcomp_str(t.seq)) for t in res.transcripts}
        assert got == exp_t, (
            f"proc {pid} mode {mode}: transcript set != single-process "
            f"oracle ({len(got)} vs {len(exp_t)}; "
            f"missing {len(exp_t - got)}, extra {len(got - exp_t)})"
        )
        n_t[mode] = len(res.transcripts)

    Path(os.environ["SMOKE_OUT"], f"ok{pid}.json").write_text(
        json.dumps(
            {
                "process": pid,
                "n_processes": jax.process_count(),
                "local_reads": int(n_local),
                "byte_range": [int(lo), int(hi)],
                "n_kmers": n,
                "n_transcripts": n_t["ownership"],
                "n_transcripts_by_mode": n_t,
            }
        )
    )
    print(
        f"child {pid}/{jax.process_count()}: OK ({n_local} local reads, "
        f"{n} kmers, {n_t} transcripts)",
        flush=True,
    )


def _launch_group(n_procs: int, work: Path, fasta: Path, expected: Path,
                  expected_t: Path) -> tuple[bool, list, list[str]]:
    """Launch one N-process child group; returns (ok, markers, outputs)."""
    for stale in work.glob("ok*.json"):
        stale.unlink()
    with socket.socket() as s:  # free localhost port
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    # Children run CPU-only: strip site hooks that register other
    # backends in every interpreter (e.g. a TPU-tunnel sitecustomize on
    # PYTHONPATH breaks jax.distributed on the CPU backend).
    env_base = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("PALLAS_AXON", "AXON_", "TPU_"))
    }
    env_base = {
        **env_base,
        "SMOKE_ROLE": "child",
        "SMOKE_FASTA": str(fasta),
        "SMOKE_EXPECTED": str(expected),
        "SMOKE_EXPECTED_T": str(expected_t),
        "SMOKE_OUT": str(work),
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
        "JAX_NUM_PROCESSES": str(n_procs),
        "PYTHONPATH": str(REPO),
    }
    procs = [
        subprocess.Popen(
            [sys.executable, __file__],
            env={**env_base, "JAX_PROCESS_ID": str(i)},
            cwd=REPO,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(n_procs)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    ok = all(p.returncode == 0 for p in procs)
    markers = []
    for i in range(n_procs):
        mp = work / f"ok{i}.json"
        if mp.exists():
            markers.append(json.loads(mp.read_text()))
    return ok and len(markers) == n_procs, markers, outs


def parent() -> None:
    import shutil

    from shannon_tpu.config import AssemblyConfig
    from shannon_tpu.io.dna import revcomp_str
    from shannon_tpu.io.fastx import write_fasta
    from shannon_tpu.oracle import assemble_oracle
    from shannon_tpu.oracle.counting import count_kmers
    from shannon_tpu.sim import sample_reads, simulate_transcripts

    work = Path("/tmp/multihost_smoke")
    work.mkdir(exist_ok=True)
    rng = np.random.default_rng(5)
    ts = simulate_transcripts(rng, n=20, length=600)
    reads = sample_reads(rng, ts, coverage=8.0, read_length=60,
                         error_rate=0.01)
    fasta = work / "reads.fasta"
    write_fasta(fasta, [(f"r{i}", s) for i, s in enumerate(reads)])

    counts = count_kmers(reads, K, strand_specific=False)
    keys = np.fromiter(counts.keys(), np.uint64, len(counts))
    vals = np.fromiter(counts.values(), np.int64, len(counts)).astype(
        np.int32
    )
    order = np.argsort(keys)
    expected = work / "expected.npz"
    np.savez(expected, kmers=keys[order], counts=vals[order])

    # single-process oracle assembly of the WHOLE read set = the
    # transcript-parity target for the multi-process pipeline (device ==
    # oracle is pinned by the test suite)
    oracle_res = assemble_oracle(reads, AssemblyConfig(k=K))
    expected_t = sorted(oracle_res.canonical_set())
    expected_t_path = work / "expected_transcripts.json"
    expected_t_path.write_text(json.dumps(expected_t))

    t0 = time.perf_counter()
    groups = {}
    all_ok = True
    outs_by_group: dict[int, list[str]] = {}
    for n_procs in (2, 4):
        shutil.rmtree(work / "pipeline_ownership", ignore_errors=True)
        shutil.rmtree(work / "pipeline_replicate", ignore_errors=True)
        ok, markers, outs = _launch_group(
            n_procs, work, fasta, expected, expected_t_path
        )
        outs_by_group[n_procs] = outs

        # parent-side check of the artifacts process 0 wrote: ownership
        # and replicate runs both equal the oracle set
        fasta_parity = {}
        volumes = None
        for mode in ("ownership", "replicate"):
            fasta_out = work / f"pipeline_{mode}" / "transcripts.fasta"
            par = False
            if fasta_out.exists():
                from shannon_tpu.io.fastx import read_fastx

                got = {
                    min(seq, revcomp_str(seq))
                    for _h, seq in read_fastx(fasta_out)
                }
                par = got == set(expected_t)
            fasta_parity[mode] = par
            stats_p = work / f"pipeline_{mode}" / "stats.json"
            if mode == "ownership" and stats_p.exists():
                st = json.loads(stats_p.read_text())
                asm = st.get("stages", {}).get("assembly", {})
                volumes = {
                    k: asm[k]
                    for k in (
                        "ownership_sent_bytes",
                        "ownership_padded_bytes",
                        "replicate_equiv_bytes",
                        "owned_paths",
                        "local_paths",
                        "owned_components",
                    )
                    if k in asm
                }
        ok = ok and all(fasta_parity.values())
        all_ok = all_ok and ok
        groups[str(n_procs)] = {
            "ok": ok,
            "fasta_parity": fasta_parity,
            "comm_volumes_proc0": volumes,
            "processes": markers,
        }

    result = {
        "ok": all_ok,
        "wall_s": round(time.perf_counter() - t0, 1),
        "n_reads": len(reads),
        "n_kmers": int(len(keys)),
        "n_transcripts_expected": len(expected_t),
        "fasta_parity": all(
            g["fasta_parity"].get("ownership", False)
            and g["fasta_parity"].get("replicate", True)
            for g in groups.values()
        ),
        "backend": "cpu (localhost processes, jax.distributed)",
        "groups": groups,
        # legacy fields some checks read
        "processes": groups["2"]["processes"],
        "what": (
            "jax.distributed.initialize xN -> per-process byte-range "
            "FASTA ingest (native pack_file_range) -> sharded count "
            "(hash all_to_all) over the N-process global mesh -> "
            "replicated merged spectrum == single-process oracle; then "
            "FULL run_pipeline in BOTH back-half modes — 'ownership' "
            "(evidence all_to_all to component owners, per-host "
            "assembly of owned components, transcript union-gather) "
            "and 'replicate' (evidence all-gather, redundant assembly) "
            "— transcript-set parity with the single-process oracle "
            "asserted in every child AND on the transcripts.fasta "
            "process 0 wrote, at 2 and 4 processes, with measured "
            "ownership-vs-replicate communication volumes"
        ),
    }
    out_path = Path(os.environ.get("SMOKE_RESULT", REPO / "MULTIHOST_SMOKE.json"))
    out_path.write_text(json.dumps(result, indent=2))
    print(json.dumps(result, indent=2))
    if not all_ok:
        for n_procs, outs in outs_by_group.items():
            for i, out in enumerate(outs):
                print(
                    f"--- group {n_procs} child {i} output ---\n{out}",
                    file=sys.stderr,
                )
        sys.exit(1)


if __name__ == "__main__":
    if os.environ.get("SMOKE_ROLE") == "child":
        child()
    else:
        parent()
