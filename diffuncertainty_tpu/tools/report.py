"""Results report CLI: walk evaluated result dirs -> table / LaTeX / plots.

    python -m diffuncertainty_tpu.tools.report results_root/**/id \
        --latex table.tex --barplot aurc:failure_detection:aurc.png

Versions are named from their path (exp/version/epoch tags); seed suffixes
``_s<k>`` group automatically (the reference's ``DsTaskTable`` seed grouping).
"""

from __future__ import annotations

import argparse
import glob
from pathlib import Path

from ..evaln.visualization import barplot, collect_results, task_table, to_latex


def discover_versions(patterns: list[str]) -> dict[str, Path]:
    versions: dict[str, Path] = {}
    for pat in patterns:
        matches = sorted(glob.glob(pat)) if any(c in pat for c in "*?[") else [pat]
        for m in matches:
            p = Path(m)
            if not (p / "metrics.json").exists():
                continue
            # name: <exp>/test_resultsN/<version>/<epoch> tail, compact and
            # unique per experiment
            name = "/".join(p.parts[-5:-1]) if len(p.parts) >= 5 else str(p)
            versions[name] = p
    return versions


def main(argv=None):
    ap = argparse.ArgumentParser(description="Aggregate evaluated results")
    ap.add_argument("dirs", nargs="+", help="result split dirs (glob ok)")
    ap.add_argument("--latex", default=None, help="write LaTeX table here")
    ap.add_argument("--barplot", default=None,
                    help="metric:task:out.png (e.g. aurc:failure_detection:a.png)")
    ap.add_argument("--no-seed-grouping", action="store_true")
    args = ap.parse_args(argv)

    versions = discover_versions(args.dirs)
    if not versions:
        raise SystemExit("no evaluated result dirs found (need metrics.json)")
    print(f"collected {len(versions)} versions: {', '.join(sorted(versions))}")
    df = collect_results(versions)
    table = task_table(df, group_seeds=not args.no_seed_grouping)
    print(table.round(4).to_string())
    if args.latex:
        Path(args.latex).write_text(to_latex(table))
        print(f"wrote {args.latex}")
    if args.barplot:
        metric, task, out = args.barplot.split(":", 2)
        barplot(df, metric=metric, task=task, out_path=out)
        print(f"wrote {out}")
    return table


if __name__ == "__main__":
    main()
