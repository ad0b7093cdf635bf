"""Convert a scripts/measure_e2e.py log (cold + steady passes with
stage echoes and the final JSON line) into the committed scale
artifact (SCALE_r03.json): n_reads, cold/steady wall + reads/s, full
stage split, distinct compiled programs, peak RSS.

Usage: python scripts/scale_artifact.py /tmp/e2e_1m.log SCALE_r03.json
If the final JSON line is absent (run cut off mid-pass), falls back to
the stage-echo lines so a partial cold pass is still recorded honestly
(partial: true).
"""
from __future__ import annotations

import json
import re
import sys


def main() -> None:
    log_path, out_path = sys.argv[1], sys.argv[2]
    text = open(log_path).read()
    out: dict = {"source": log_path}
    complete = False
    for ln in text.splitlines():
        if ln.startswith("{"):
            # a truncated final line (run killed mid-print) or an
            # unrelated '{'-prefixed echo must fall through to the
            # stage-echo partial mode, not crash (ADVICE r3)
            try:
                d = json.loads(ln)
                out.update(
                    {
                        "partial": False,
                        "n_reads": d.get("n_reads"),
                        "cold": d["cold"],
                        "steady": d["steady"],
                        "stats": d["stats"],
                        "distinct_programs": d.get("distinct_programs"),
                        "peak_rss_mb": d.get("peak_rss_mb"),
                    }
                )
            except (json.JSONDecodeError, KeyError):
                continue
            complete = True
            break
    if not complete:
        stages = re.findall(r"\[[\d:]+\] (\S+): ([\d.]+)s(.*)", text)
        out.update(
            {
                "partial": True,
                "stages_seen": [
                    {"stage": s, "wall_s": float(w), "notes": n.strip()}
                    for s, w, n in stages
                ],
                "cache_misses": text.count("CACHE MISS"),
            }
        )
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"wrote {out_path} (partial={out.get('partial')})")


if __name__ == "__main__":
    main()
