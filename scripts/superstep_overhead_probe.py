"""Per-superstep fixed-overhead probe (LPA shuffle plan, executor JVMs).

The north rule's scaling criterion compares N vs 4N executors on the
SAME input (strong scaling). A per-superstep fixed cost c (stage
scheduling, task launch, shuffle-service round trips, barrier sync)
does not shrink with executors, so measured efficiency is

    eff = (c + w·E) / (4 · (c + w·E/4)) = (c + w·E) / (4c + w·E)

which is < 1 for any c > 0 and approaches 1 as per-superstep volume
w·E grows — i.e. exactly the regime a 10^12-edge production graph is
in. This probe MEASURES c instead of assuming it: run the identical
LPA x`iters` shuffle-plan job at several edge counts on the SAME
parallelism (local-cluster[8,4] — 32 cores in 8 executor JVMs), take
the steal-robust per-superstep wall at each size (min per superstep
index across repeats, then median), and least-squares fit
t(E) = c + w·E. Appends the fit and the implied large-E efficiency
curve to BENCH.md.

Run: python scripts/superstep_overhead_probe.py [sizes_csv] [iters] [repeats]
Defaults: sizes 60,120,240 (millions), iters 12, repeats 2.
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo/scripts")
from scaling_bench import run  # noqa: E402


def robust_ss(runs: list[dict]) -> float:
    """Median of per-index minima over warm supersteps (4+); with
    fewer than 4 supersteps fall back to all of them rather than
    median([]) (ADVICE r4)."""
    arrs = [r["per_superstep_sec"] for r in runs]
    n = min(len(a) for a in arrs)
    start = 3 if n > 3 else 0
    mins = [min(a[i] for a in arrs) for i in range(start, n)]
    return statistics.median(mins)


def main() -> None:
    sizes_m = [int(s) for s in (sys.argv[1].split(",") if len(sys.argv) > 1 else ["60", "120", "240"])]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    points = []
    for m in sizes_m:
        n_edges = m * 1_000_000
        runs = [run(32, n_edges, iters, "shuffle", "lpa", "jvms") for _ in range(repeats)]
        t = robust_ss(runs)
        edges = runs[0]["edges"]
        points.append((edges, t, [r["per_superstep_sec"] for r in runs]))
        print(f"E={edges:,} robust_ss={t:.3f}s", flush=True)

    # least-squares fit t = c + w*E
    n = len(points)
    xs = [p[0] for p in points]
    ys = [p[1] for p in points]
    xbar, ybar = sum(xs) / n, sum(ys) / n
    w = sum((x - xbar) * (y - ybar) for x, y in zip(xs, ys)) / sum((x - xbar) ** 2 for x in xs)
    c = ybar - w * xbar
    ts = time.strftime("%Y-%m-%d %H:%M:%S")

    def eff(E: float) -> float:
        # strong-scaling efficiency implied by the fit: w is the
        # 32-core (4N) marginal per-edge rate, so the 4N side pays
        # t_hi = c + w*E and the N side t_lo = c + 4*w*E per superstep
        # (quarter the cores -> 4x the marginal work), with the same
        # fixed scheduler cost c on both sides.
        return (c + 4 * w * E) / (4 * (c + w * E))

    with open("/root/repo/BENCH.md", "a") as f:
        f.write(
            f"\n## Superstep fixed-overhead probe {ts} (lpa x{iters}, plan=shuffle, "
            f"local-cluster[8,4] fixed, sizes {','.join(str(s) + 'M' for s in sizes_m)}, "
            f"min-per-index-of-{repeats} then median)\n\n"
            f"| edges | robust superstep wall (s) |\n|---|---|\n"
        )
        for edges, t, _ in points:
            f.write(f"| {edges:,} | {t:.3f} |\n")
        f.write(
            f"\nLeast-squares fit t(E) = c + w·E: **c = {c:.3f}s fixed per superstep**, "
            f"w = {w * 1e9:.3f} ns/edge (marginal rate "
            f"{1.0 / w / 1e6:,.0f}M edges/s). Implied strong-scaling efficiency at "
            f"4x executors if both sides pay the same fixed c: "
            + ", ".join(
                f"E={E // 1_000_000}M → {eff(E):.2f}" for E in [xs[0], xs[-1], xs[-1] * 10, xs[-1] * 100]
            )
            + ". The fixed cost is scheduler/stage overhead that does not scale with "
            f"executors; production supersteps at 10^12 edges move ~4000x more volume "
            f"per superstep, so the c term vanishes from the ratio there.\n"
        )
        f.write(f"\nAll per-superstep walls: {[(p[0], p[2]) for p in points]}\n")


if __name__ == "__main__":
    main()
