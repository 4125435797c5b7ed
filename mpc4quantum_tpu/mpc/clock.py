"""Step clock: timing bookkeeping for the receding-horizon loop.

Static dataclass mirror of reference mpc.py:14-35 (`StepClock`). All values
are python scalars resolved at trace time; the driver only needs the counts
(shapes) and dt (data).
"""

from __future__ import annotations

import dataclasses

import numpy as np


def val_to_str(val) -> str:
    """Filename-safe float encoding (reference mpc.py:64-68)."""
    s = f"{val:.1E}".replace("E", "e").replace(".", "d")
    return s.replace("-", "m").replace("+", "")


@dataclasses.dataclass(frozen=True)
class StepClock:
    dt: float
    horizon: int
    n_steps: int
    measure_freq: int = 1

    @property
    def ts(self) -> np.ndarray:
        return np.linspace(0.0, self.dt * self.n_steps, self.n_steps, endpoint=False)

    def ts_step(self, a_step: int) -> np.ndarray:
        """Measurement-stitch window (reference mpc.py:26-27)."""
        return np.linspace(
            self.dt * (a_step + 1 - self.measure_freq),
            self.dt * (a_step + 1),
            self.measure_freq + 1,
        )

    def ts_horizon(self, a_step: int) -> np.ndarray:
        """Per-step horizon times (reference mpc.py:29-30)."""
        return np.linspace(
            self.dt * a_step, self.dt * (a_step + self.horizon), self.horizon, endpoint=False
        )

    def to_string(self) -> str:
        return "_".join(
            ["mf", val_to_str(self.measure_freq), "dt", val_to_str(self.dt),
             "h", val_to_str(self.horizon), "n", val_to_str(self.n_steps)]
        )
