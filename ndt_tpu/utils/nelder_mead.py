"""Derivative-free Nelder-Mead simplex optimizer — an EXACT transcription of
the reference's inverted-control state machine (nelder-mead.c), so that the
iterate sequence is bit-identical to the C for the same seed and values.

Reference quirks preserved deliberately (all verified against
nelder-mead.c:85-463):

* initial simplex: point i (1-based) offsets the seed by ``i`` along axis
  i-1 (nm_next_point, nelder-mead.c:306-320) — NOT a unit step;
* shrink replaces only the two worst vertices h and s, pulling them toward
  the last reflection point ``x_r`` (states shrink/shrink2,
  nelder-mead.c:383-396), not the classic all-points-toward-best shrink;
* ``iterations`` counts every add_result call, including the initial
  simplex fills and both shrink replacements (nelder-mead.c:173);
* done() = iterations exceeded OR |best - worst| < threshold
  (nm_done, nelder-mead.c:421-447);
* a failed contraction re-enters the accept/decide block with the
  contraction point playing the role of the new result, which can issue
  another contraction against the unchanged ``x_r``
  (nelder-mead.c:263-303);
* the centroid is the running sum of the count-1 best vertices scaled by
  1/(count-1), accumulated in simplex order (nelder-mead.c:344-351).

Hyper-parameters alpha=1, beta=0.5, gamma=2, delta=0.5
(nelder-mead.c:118-123; delta is unused by the two-point shrink).

Runs host-side at scene-prep only (minimal bounding spheres,
bounding.c:177-240; the nelder-mead visualization scene); never on the ray
hot path.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import numpy as np

ALPHA = 1.0   # reflection   (nelder-mead.c:118)
BETA = 0.5    # contraction
GAMMA = 2.0   # expansion
DELTA = 0.5   # shrink (unused: the C's shrink is the x_r two-point variant)

INITIAL, REFLECT, EXPAND, CONTRACT_OUT, CONTRACT_IN, SHRINK, SHRINK2 = \
    range(7)


class NelderMead:
    """Ask/tell Nelder-Mead over R^dim (nm_* API rebuild).

    Both driver orders used by the reference work:
        x = nm.next_point(); nm.add_result(x, f(x))          (ask/tell)
        nm.add_result(x, f(x)); x = nm.next_point()          (C scenes)
    because next_point() in the initial state returns the seed until the
    first result arrives (nm_next_point, nelder-mead.c:306-326).
    """

    def __init__(self, dim: int):
        self.dim = dim
        self.seed = np.zeros(dim, dtype=np.float64)
        self.state = INITIAL
        self.iterations = 0
        self._points: List[np.ndarray] = []   # simplex vertices
        self._values: List[float] = []
        self._x_r: Optional[Tuple[np.ndarray, float]] = None
        self._x_e: Optional[Tuple[np.ndarray, float]] = None
        self._x_c: Optional[Tuple[np.ndarray, float]] = None
        self._s_shrink = np.zeros(dim, dtype=np.float64)
        self.history: List[np.ndarray] = []   # every evaluated point

    # -- nm_set_seed (nelder-mead.c:151-155) -----------------------------
    def set_seed(self, seed):
        if self.state == INITIAL:
            self.seed = np.asarray(seed, dtype=np.float64).copy()
        return self

    # -- nmSimplexSort: stable ascending by value (nelder-mead.c:56-81) --
    def _sort(self):
        order = sorted(range(len(self._values)),
                       key=lambda i: self._values[i])
        # python sorted is stable; the C bubble sort is too
        self._points = [self._points[i] for i in order]
        self._values = [self._values[i] for i in order]

    # -- nm_add_result (nelder-mead.c:170-304) ----------------------------
    def add_result(self, parameters, value):
        p = np.asarray(parameters, dtype=np.float64).copy()
        value = float(value)
        self.iterations += 1
        self.history.append(p)

        if self.state == SHRINK2:
            self._points[-2] = p
            self._values[-2] = value
            self.state = REFLECT
            return self
        if self.state == SHRINK:
            self._points[-1] = p
            self._values[-1] = value
            self.state = SHRINK2
            return self

        if len(self._points) <= self.dim:       # initial fills
            self._points.append(p)
            self._values.append(value)
            if len(self._points) >= self.dim + 1:
                self.state = REFLECT
            return self

        self._sort()
        h_v = self._values[-1]
        s_v = self._values[-2]
        l_v = self._values[0]
        r = (p, value)

        if self.state == REFLECT:
            self._x_r = r
            if l_v <= value < s_v:              # accept x_r
                self._points[-1], self._values[-1] = p, value
                return self
        if self.state == EXPAND:
            self._x_e = r
            if value < self._x_r[1]:            # accept x_e
                self._points[-1], self._values[-1] = p, value
            else:                               # accept x_r
                self._points[-1], self._values[-1] = self._x_r
            self.state = REFLECT
            return self
        if self.state == CONTRACT_OUT:
            self._x_c = r
            if value < self._x_r[1]:            # accept x_c
                self._points[-1], self._values[-1] = p, value
                self.state = REFLECT
                return self
        if self.state == CONTRACT_IN:
            self._x_c = r
            if value < h_v:                     # accept x_c
                self._points[-1], self._values[-1] = p, value
                self.state = REFLECT
                return self

        # next state when the point was not accepted (nelder-mead.c:288-303)
        if value < l_v:
            self.state = EXPAND
            return self
        if value >= s_v:
            if s_v <= value < h_v:
                self.state = CONTRACT_OUT
            else:
                self.state = CONTRACT_IN
            return self
        self.state = SHRINK
        return self

    # -- nm_next_point (nelder-mead.c:306-407) ----------------------------
    def next_point(self) -> np.ndarray:
        n = len(self._points)
        if self.state == INITIAL and n < self.dim + 1:
            if n > 0:
                v = self.seed.copy()
                v[n - 1] += n                   # nelder-mead.c:311-313
                return v
            return self.seed.copy()
        if n != self.dim + 1:
            return self.seed.copy()

        if self.state not in (SHRINK, SHRINK2):
            self._sort()
        h_p = self._points[-1]
        s_p = self._points[-2]

        # centroid of the count-1 best, accumulated in simplex order
        c = np.zeros(self.dim, dtype=np.float64)
        for i in range(n - 1):
            c = c + self._points[i]
        c = c * (1.0 / (n - 1))

        if self.state == REFLECT:
            return c + ALPHA * (c - h_p)
        if self.state == EXPAND:
            return c + GAMMA * (self._x_r[0] - c)
        if self.state == CONTRACT_OUT:
            return c + BETA * (self._x_r[0] - c)
        if self.state == CONTRACT_IN:
            return c + BETA * (h_p - c)
        if self.state == SHRINK:
            self._s_shrink = 0.5 * (self._x_r[0] + s_p)
            return 0.5 * (self._x_r[0] + h_p)
        # SHRINK2
        v = self._s_shrink
        self._s_shrink = np.zeros(self.dim, dtype=np.float64)
        return v

    # -- nm_best_point: first strict minimum (nelder-mead.c:157-168) ------
    def best_point(self) -> np.ndarray:
        best = 0
        for i in range(len(self._values)):
            if self._values[i] < self._values[best]:
                best = i
        return self._points[best].copy()

    def best_value(self) -> float:
        return min(self._values)

    # -- nm_simplex_point (nelder-mead.c:409-419) --------------------------
    def simplex_point(self, which: int):
        """Returns (point, value) or None when ``which`` is out of range."""
        if which >= len(self._points):
            return None
        return self._points[which].copy(), self._values[which]

    # -- nm_done (nelder-mead.c:421-447) -----------------------------------
    def done(self, threshold: float, iterations: int) -> bool:
        if self.state == INITIAL:
            return False
        if self.iterations > iterations:
            return True
        if self.state not in (SHRINK, SHRINK2):
            self._sort()
        dist = float(np.sqrt(((self._points[0] - self._points[-1]) ** 2)
                             .sum()))
        return dist < threshold


def minimize(fn: Callable[[np.ndarray], float], x0, eps=1e-4,
             max_iterations=1000) -> np.ndarray:
    """Drive a NelderMead to convergence; returns the best point."""
    nm = NelderMead(len(np.asarray(x0))).set_seed(x0)
    while not nm.done(eps, max_iterations):
        x = nm.next_point()
        nm.add_result(x, fn(x))
    return nm.best_point()
