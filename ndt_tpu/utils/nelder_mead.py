"""Derivative-free Nelder-Mead simplex optimizer (nelder-mead.{h,c} rebuild).

The reference implements NM as an inverted-control state machine
(states reflect/expand/contract/shrink, coefficients alpha=1, beta=0.5,
gamma=2, delta=0.5 -- nelder-mead.c:85-123) because the C caller owns the
evaluation loop.  Here the host owns everything, so we expose both:

* :class:`NelderMead` -- an ask/tell interface mirroring
  nm_init/set_seed/add_result/next_point/best_point/done, used by the
  nelder-mead visualization scene which needs the iterate history
  (scenes/nelder-mead.c).
* :func:`minimize` -- a convenience driver.

Runs host-side at scene-prep only (minimal bounding spheres,
bounding.c:177-240); never on the ray hot path.
"""

from __future__ import annotations

from typing import Callable, List, Optional

import numpy as np

ALPHA = 1.0   # reflection   (nelder-mead.c:120)
BETA = 0.5    # contraction
GAMMA = 2.0   # expansion
DELTA = 0.5   # shrink


class NelderMead:
    """Ask/tell Nelder-Mead over R^dim.

    Usage:
        nm = NelderMead(dim).set_seed(x0)
        while not nm.done(eps, max_iter):
            x = nm.next_point()
            nm.add_result(x, f(x))
    """

    def __init__(self, dim: int):
        self.dim = dim
        self.seed: Optional[np.ndarray] = None
        self.points: List[np.ndarray] = []   # simplex vertices
        self.values: List[float] = []
        self._pending: List[np.ndarray] = [] # points awaiting evaluation
        self._phase = "init"
        self._trial: Optional[np.ndarray] = None
        self._trial_kind: Optional[str] = None
        self.iterations = 0
        self.history: List[np.ndarray] = []  # every evaluated point, in order

    # -- seeding: initial simplex = seed plus a unit step per axis ------
    def set_seed(self, seed):
        self.seed = np.asarray(seed, dtype=np.float64).copy()
        self._pending = [self.seed.copy()]
        for i in range(self.dim):
            p = self.seed.copy()
            p[i] += 1.0
            self._pending.append(p)
        return self

    def next_point(self) -> np.ndarray:
        if self._pending:
            return self._pending[0].copy()
        return self._propose()

    def add_result(self, point, value):
        point = np.asarray(point, dtype=np.float64).copy()
        self.history.append(point)
        if self._pending:
            self._pending.pop(0)
            self.points.append(point)
            self.values.append(float(value))
            if not self._pending:
                self._sort()
                self._phase = "reflect"
            return self
        self._accept_trial(point, float(value))
        return self

    def best_point(self) -> np.ndarray:
        self._sort()
        return self.points[0].copy()

    def best_value(self) -> float:
        self._sort()
        return self.values[0]

    def simplex_point(self, i: int) -> np.ndarray:
        return self.points[i].copy()

    def done(self, eps: float, max_iterations: int) -> bool:
        if self._pending or self._phase == "init":
            return False
        if self.iterations >= max_iterations:
            return True
        spread = max(self.values) - min(self.values)
        size = max(np.linalg.norm(p - self.points[0]) for p in self.points)
        return spread < eps and size < eps

    # -- internals ------------------------------------------------------
    def _sort(self):
        order = np.argsort(self.values, kind="stable")
        self.points = [self.points[i] for i in order]
        self.values = [self.values[i] for i in order]

    def _centroid(self):
        return np.mean(self.points[:-1], axis=0)

    def _propose(self) -> np.ndarray:
        c = self._centroid()
        worst = self.points[-1]
        if self._phase == "reflect":
            self._trial = c + ALPHA * (c - worst)
            self._trial_kind = "reflect"
        elif self._phase == "expand":
            self._trial = c + GAMMA * (self._reflected - c)
            self._trial_kind = "expand"
        elif self._phase == "contract_out":
            self._trial = c + BETA * (self._reflected - c)
            self._trial_kind = "contract_out"
        elif self._phase == "contract_in":
            self._trial = c - BETA * (c - worst)
            self._trial_kind = "contract_in"
        elif self._phase == "shrink":
            i = self._shrink_idx
            self._trial = self.points[0] + DELTA * (self.points[i] - self.points[0])
            self._trial_kind = "shrink"
        return self._trial.copy()

    def _accept_trial(self, point, value):
        self.iterations += 1
        kind = self._trial_kind
        if kind == "reflect":
            self._reflected = point
            self._reflected_val = value
            if value < self.values[0]:
                self._phase = "expand"
            elif value < self.values[-2]:
                self._replace_worst(point, value)
                self._phase = "reflect"
            elif value < self.values[-1]:
                self._phase = "contract_out"
            else:
                self._phase = "contract_in"
        elif kind == "expand":
            if value < self._reflected_val:
                self._replace_worst(point, value)
            else:
                self._replace_worst(self._reflected, self._reflected_val)
            self._phase = "reflect"
        elif kind == "contract_out":
            if value <= self._reflected_val:
                self._replace_worst(point, value)
                self._phase = "reflect"
            else:
                self._start_shrink()
        elif kind == "contract_in":
            if value < self.values[-1]:
                self._replace_worst(point, value)
                self._phase = "reflect"
            else:
                self._start_shrink()
        elif kind == "shrink":
            self.points[self._shrink_idx] = point
            self.values[self._shrink_idx] = value
            self._shrink_idx += 1
            if self._shrink_idx >= len(self.points):
                self._sort()
                self._phase = "reflect"
            else:
                self._phase = "shrink"

    def _replace_worst(self, point, value):
        self.points[-1] = point
        self.values[-1] = value
        self._sort()

    def _start_shrink(self):
        self._sort()
        self._shrink_idx = 1
        self._phase = "shrink"


def minimize(fn: Callable[[np.ndarray], float], x0, eps=1e-4,
             max_iterations=1000) -> np.ndarray:
    """Drive a NelderMead to convergence; returns the best point."""
    nm = NelderMead(len(np.asarray(x0))).set_seed(x0)
    while not nm.done(eps, max_iterations):
        x = nm.next_point()
        nm.add_result(x, fn(x))
    return nm.best_point()
