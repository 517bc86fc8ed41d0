"""Driver-side optimizers for GBM step sizes.

The reference uses commons-math3 Brent (``GBMRegressor.scala:311,412-421``) and
breeze L-BFGS-B (``GBMClassifier.scala:290-292``). scipy is not guaranteed in
this environment, so we ship self-contained implementations and use scipy when
importable:

* :func:`minimize_scalar_bounded` — golden-section search on [lo, hi];
* :func:`minimize_nonneg` — projected gradient descent with Armijo
  backtracking on x ≥ 0 (each function evaluation is one Spark ``agg`` for the
  caller, so iteration counts are kept small).
"""

from __future__ import annotations

import math
from typing import Callable, List, Sequence, Tuple

try:  # pragma: no cover - scipy absent in the target env
    from scipy.optimize import minimize as _scipy_minimize
    from scipy.optimize import minimize_scalar as _scipy_minimize_scalar

    _HAVE_SCIPY = True
except ImportError:
    _HAVE_SCIPY = False

_PHI = (math.sqrt(5) - 1) / 2


def minimize_scalar_bounded(
    fun: Callable[[float], float],
    lo: float = 0.0,
    hi: float = 100.0,
    max_iter: int = 100,
    tol: float = 1e-6,
) -> float:
    if _HAVE_SCIPY:  # pragma: no cover
        res = _scipy_minimize_scalar(
            fun,
            bounds=(lo, hi),
            method="bounded",
            options={"maxiter": max_iter, "xatol": max(tol, 1e-8)},
        )
        return float(res.x)
    a, b = lo, hi
    c, d = b - _PHI * (b - a), a + _PHI * (b - a)
    fc, fd = fun(c), fun(d)
    evals = 2
    while evals < max_iter and abs(b - a) > max(tol, 1e-8):
        if fc < fd:
            b, d, fd = d, c, fc
            c = b - _PHI * (b - a)
            fc = fun(c)
        else:
            a, c, fc = c, d, fd
            d = a + _PHI * (b - a)
            fd = fun(d)
        evals += 1
    return (a + b) / 2


def minimize_nonneg(
    fun_and_grad: Callable[[Sequence[float]], Tuple[float, List[float]]],
    x0: Sequence[float],
    max_iter: int = 25,
    tol: float = 1e-6,
) -> List[float]:
    """min f(x) s.t. x >= 0 via projected gradient + Armijo backtracking."""
    if _HAVE_SCIPY:  # pragma: no cover
        import numpy as np

        res = _scipy_minimize(
            lambda x: fun_and_grad(x),
            x0=np.asarray(x0, dtype=float),
            jac=True,
            method="L-BFGS-B",
            bounds=[(0.0, None)] * len(x0),
            options={"maxiter": max_iter, "gtol": tol},
        )
        return [float(v) for v in res.x]

    x = [max(float(v), 0.0) for v in x0]
    f, g = fun_and_grad(x)
    step = 1.0
    for _ in range(max_iter):
        gnorm = math.sqrt(sum(gi * gi for gi in g))
        if gnorm < tol:
            break
        # projected step with backtracking on the Armijo condition
        improved = False
        s = step
        for _ in range(12):
            cand = [max(xi - s * gi, 0.0) for xi, gi in zip(x, g)]
            if all(abs(c - xi) < 1e-15 for c, xi in zip(cand, x)):
                break
            fc, gc = fun_and_grad(cand)
            desc = sum(gi * (ci - xi) for gi, ci, xi in zip(g, cand, x))
            if fc <= f + 1e-4 * desc:
                x, f, g = cand, fc, gc
                step = s * 1.5  # allow growth after a good step
                improved = True
                break
            s *= 0.3
        if not improved:
            break
    return x


def minimize_nonneg_batched(
    fun_and_grad: Callable[[Sequence[float]], Tuple[float, List[float]]],
    losses_batch: Callable[[Sequence[Sequence[float]]], List[float]],
    x0: Sequence[float],
    max_iter: int = 15,
    tol: float = 1e-6,
    rel_tol: float = 1e-4,
    ladder: int = 8,
    losses_grad0_batch: Callable[
        [Sequence[Sequence[float]]], Tuple[List[float], List[float]]
    ] = None,
) -> List[float]:
    """min f(x) s.t. x ≥ 0 — projected gradient where Armijo backtracking
    is evaluated in batched ``losses_batch`` calls.

    Motivation (r6, measured): for the GBM classifier every function
    evaluation is a cluster-wide ``agg``; the sequential
    :func:`minimize_nonneg` spent up to 12 aggs inside a single backtracking
    loop (one fit iteration burned 32 evals / 12.7s at sf0.1). r10
    (profiled: the batched agg's per-row cost is LINEAR in ladder width and
    the line search was 70-75% of fit wall time): the ladder is evaluated
    in two CONSTANT-width halves — the shallow half first, the deep half
    only when every shallow rung rejects, which Barzilai-Borwein step
    sizing makes rare — so the common-case outer iteration costs one
    half-width loss agg plus one gradient evaluation at the accepted
    point (two aggs; worst case three). Constant half-width keeps both
    generated plans structurally identical across iterations (codegen
    compiles each once). ``rel_tol`` is the relative-improvement stop — a
    GBM step size multiplied by a learning rate only needs ~1% accuracy.

    r12 (VERDICT r11 next #6 — the reference ``GBMLossAggregator``'s
    one-pass loss+gradient trick, ``GBMLoss.scala:34-76``): pass
    ``losses_grad0_batch`` — same contract as ``losses_batch`` but ALSO
    returning the gradient evaluated at the FIRST candidate — and the
    common-case outer iteration collapses to ONE full-frame agg: BB step
    sizing accepts rung 0 almost always, and its gradient then rides in
    the same pass instead of funding a second ``fun_and_grad`` scan.
    Deeper-rung acceptance falls back to the separate gradient agg.
    Acceptance order is untouched (the loss values are the identical
    expressions), so trajectories are unchanged.
    """
    x = [max(float(v), 0.0) for v in x0]
    f, g = fun_and_grad(x)
    step = 1.0
    x_prev = g_prev = None
    for _ in range(max_iter):
        gnorm = math.sqrt(sum(gi * gi for gi in g))
        if gnorm < tol:
            break
        if x_prev is not None:
            # Barzilai-Borwein step: step ≈ (Δx·Δx)/(Δx·Δg) adapts the
            # magnitude from observed curvature — plain projected gradient
            # with multiplicative growth crawled toward step sizes of 2-6
            # over all 15 iterations (measured f trajectories); BB lands
            # there in 2-3.
            dx = [a - b for a, b in zip(x, x_prev)]
            dg = [a - b for a, b in zip(g, g_prev)]
            denom = sum(a * b for a, b in zip(dx, dg))
            if denom > 1e-18:
                step = min(max(sum(a * a for a in dx) / denom, 1e-4), 1e4)
        scales = [step * (0.3 ** j) for j in range(ladder)]
        cands = [
            [max(xi - s * gi, 0.0) for xi, gi in zip(x, g)] for s in scales
        ]

        def _scan(ss, cs, fcs):
            for j, (s, c, fc) in enumerate(zip(ss, cs, fcs)):
                if all(abs(ci - xi) < 1e-15 for ci, xi in zip(c, x)):
                    continue  # projection made this rung a no-op
                desc = sum(gi * (ci - xi) for gi, ci, xi in zip(g, c, x))
                if fc <= f + 1e-4 * desc:
                    return (j, s, c, fc)
            return None

        # Split the ladder (r10, profiled): the batched loss agg is the
        # fit's dominant cost and its per-row work is LINEAR in ladder
        # width, while BB step sizing makes acceptance land on the first
        # rungs almost always — so evaluate the top half first and pay
        # for the deep rungs only when every shallow rung rejects.
        # Acceptance semantics are IDENTICAL to the full-width scan
        # (first accepted rung in order), so trajectories — and the
        # oracle-checked fitted weights — are bit-for-bit unchanged.
        half = max(1, ladder // 2)
        grad0 = None
        if losses_grad0_batch is not None:
            fcs, grad0 = losses_grad0_batch(cands[:half])
        else:
            fcs = losses_batch(cands[:half])
        accepted = _scan(scales[:half], cands[:half], fcs)
        if accepted is None and half < ladder:
            fcs2 = losses_batch(cands[half:])
            acc2 = _scan(scales[half:], cands[half:], fcs2)
            accepted = (
                None
                if acc2 is None
                else (acc2[0] + half, acc2[1], acc2[2], acc2[3])
            )
        if accepted is None:
            break
        j, s, c, fc = accepted
        improved_enough = (f - fc) >= rel_tol * max(abs(f), 1e-12)
        x_prev, g_prev = x, g
        x, f = c, fc
        if not improved_enough:
            break
        if j == 0 and grad0 is not None:
            g = grad0  # the fused pass already evaluated ∇f at rung 0
        else:
            _, g = fun_and_grad(x)
        step = s
    return x


def minimize_scalar_batched(
    fun_batch: Callable[[Sequence[float]], List[float]],
    lo: float = 0.0,
    hi: float = 100.0,
    rounds: int = 3,
    points: int = 9,
) -> float:
    """Scalar minimization where the objective can evaluate a BATCH of
    candidates in one call (for Spark: one agg computing N loss sums instead
    of N sequential aggs — golden-section's eval count at 1/10 the job count).

    Round 1 scans a log-ish grid over [lo, hi]; each later round re-grids
    linearly around the incumbent. Precision after 3 rounds ≈ (hi−lo)/points³,
    plenty for a GBM step size multiplied by a learning rate.
    """
    # log-spaced-ish first grid (denser near the typical optimum ~1)
    grid = sorted(
        {
            lo,
            *(lo + (hi - lo) * (i / (points - 1)) ** 3 for i in range(points)),
            1.0,
            hi,
        }
    )
    best_x, best_f = None, None
    for _ in range(rounds):
        fs = fun_batch(list(grid))
        for x, fx in zip(grid, fs):
            if best_f is None or fx < best_f:
                best_x, best_f = x, fx
        # linear re-grid around the incumbent (which may be from a prior grid)
        i = min(range(len(grid)), key=lambda j: abs(grid[j] - best_x))
        a = grid[max(i - 1, 0)]
        b = grid[min(i + 1, len(grid) - 1)]
        if b - a < 1e-9:
            break
        grid = sorted({a + (b - a) * j / (points - 1) for j in range(points)})
    return float(best_x)
