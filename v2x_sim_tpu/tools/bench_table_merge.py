"""Merge independently-launched bench_table sweeps into one multi-seed table.

The production-geometry det sweeps run ~6 h each on the single tunneled
TPU chip, so seeds are swept as separate processes (one `--seed N`
invocation each) rather than in-process via `--seeds` (which would
serialize them inside one run and lose everything on a crash). Each sweep
appends per-mode convergence records to `<out>_curves.jsonl`
(bench_table.py `run_mode`); this tool folds any number of those files
into a single markdown artifact:

  - per mode: final-milestone mAP@0.5 / mAP@0.7 / task loss per seed,
    plus mean±std across seeds (the error bars VERDICT r3 #1/#6 asked
    production rows to carry, matching the CI-scale table's format);
  - per mode: the mAP@0.5 trajectory at every eval milestone, the
    convergence evidence for the signature-ordering claim.

Reference parity: the reference's tables are single-run README markdown
(† coperception/tools/det/README.md); the multi-seed fold mirrors how
BENCH_TABLE.md (CI scale) reports 3-seed error bars.

Usage:
  python -m v2x_sim_tpu.tools.bench_table_merge \
      --curves BENCH_TABLE_FULL_curves.jsonl,BENCH_TABLE_FULL_SEED1_curves.jsonl \
      --out BENCH_TABLE_FULL_SEEDS.md
"""

from __future__ import annotations

import argparse
import json
from collections import defaultdict


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--curves", required=True,
        help="comma list of *_curves.jsonl files, one per sweep/seed",
    )
    p.add_argument("--out", default="BENCH_TABLE_FULL_SEEDS.md")
    p.add_argument(
        "--note", default="",
        help="extra provenance line for the table header",
    )
    return p.parse_args()


def load_records(paths):
    """-> {mode: {seed: curve}} with curves sorted by step. A mode/seed
    appearing in several files keeps the last occurrence (reruns win)."""
    by_mode = defaultdict(dict)
    for path in paths:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                curve = sorted(rec["curve"], key=lambda c: c["step"])
                by_mode[rec["mode"]][rec.get("seed", 0)] = curve
    return by_mode


def _mean_std(vals):
    n = len(vals)
    mean = sum(vals) / n
    std = (sum((v - mean) ** 2 for v in vals) / n) ** 0.5
    return f"{mean:.4g}±{std:.2g}" if n > 1 else f"{mean:.4g}"


def render(by_mode, curves_paths, note=""):
    seeds = sorted({s for m in by_mode.values() for s in m})
    lines = [
        "# Production-geometry det benchmark — multi-seed fold",
        "",
        "Merged from: " + ", ".join(f"`{p}`" for p in curves_paths)
        + (f" — {note}" if note else ""),
        "",
        "Each seed is an independent full sweep (fresh pool, fresh init,"
        " identical held-out eval scenes). Cells are the final-milestone"
        " value; ± is the population std across seeds. **Absolute numbers"
        " are NOT comparable to the reference's published tables** (short"
        " synthetic budget) — the per-mode ordering and its stability"
        " across seeds are the signal.",
        "",
    ]
    head = (
        ["mode"]
        + [f"mAP@0.5 s{s}" for s in seeds]
        + ["mAP@0.5 mean±std", "mAP@0.7 mean±std", "task_loss mean±std", "seeds"]
    )
    lines.append("| " + " | ".join(head) + " |")
    lines.append("|" + "---|" * len(head))
    for mode, per_seed in by_mode.items():
        finals = {s: c[-1] for s, c in per_seed.items()}
        row = [mode]
        row += [
            f"{finals[s]['mAP@0.5']:g}" if s in finals else "—" for s in seeds
        ]
        for key in ("mAP@0.5", "mAP@0.7", "loss"):
            row.append(_mean_std([f[key] for f in finals.values()]))
        row.append(str(len(finals)))
        lines.append("| " + " | ".join(row) + " |")
    lines += [
        "",
        "## Convergence (mAP@0.5 at each eval milestone)",
        "",
    ]
    for mode, per_seed in by_mode.items():
        for s, curve in sorted(per_seed.items()):
            traj = " → ".join(
                f"{c['mAP@0.5']:g}@{c['step']}" for c in curve
            )
            lines.append(f"- **{mode}** seed {s}: {traj}")
    lines.append("")
    return "\n".join(lines)


def main():
    args = parse_args()
    paths = [p.strip() for p in args.curves.split(",") if p.strip()]
    by_mode = load_records(paths)
    if not by_mode:
        raise SystemExit("no records found in " + ", ".join(paths))
    with open(args.out, "w") as f:
        f.write(render(by_mode, paths, args.note))
    print(f"wrote {args.out} ({len(by_mode)} modes)")


if __name__ == "__main__":
    main()
