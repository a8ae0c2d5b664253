"""Archive the LAST contiguous segment of a training jsonl into docs/runs/.

Trainers append to the same logs/<experiment>.jsonl across runs and resumes;
judging artifacts should carry exactly one run's curve. A segment boundary is
a step-counter decrease.

Usage: python scripts/archive_run.py logs/fused_X.jsonl docs/runs/out.jsonl [--segment -1]
"""

import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--segment", type=int, default=-1,
                   help="which segment (0-based; default last)")
    args = p.parse_args()

    rows = [json.loads(l) for l in open(args.src) if l.strip()]
    segments, cur, prev = [], [], None
    for r in rows:
        s = r.get("step", 0)
        if prev is not None and s < prev:
            segments.append(cur)
            cur = []
        cur.append(r)
        prev = s
    segments.append(cur)
    seg = segments[args.segment]
    with open(args.dst, "w") as f:
        for r in seg:
            f.write(json.dumps(r) + "\n")
    evals = [r["eval/episode_reward_mean"] for r in seg
             if "eval/episode_reward_mean" in r]
    alt = [r["fused/eval_return"] for r in seg if "fused/eval_return" in r]
    evals = evals or alt
    print(
        f"{len(segments)} segments in {args.src}; wrote segment "
        f"{args.segment} ({len(seg)} rows, steps "
        f"{seg[0].get('step')}..{seg[-1].get('step')}) -> {args.dst}"
    )
    if evals:
        print(f"evals: n={len(evals)} best={max(evals):.1f} "
              f"last={evals[-1]:.1f}")


if __name__ == "__main__":
    main()
