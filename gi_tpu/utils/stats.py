"""Ray statistics and phase timing — the reference's observability layer
(thread-local `__thread` ray counters rolled into atomics, render.cpp:26-41,
141-148; verbose report render.cpp:224-254, photonmap.cpp:416-435)
re-expressed TPU-natively: each jitted tile returns a small int32 counter
vector (P4: per-device counter arrays, psum/summed on host), accumulated
into python ints across tiles.

Counting semantics: the TPU wavefront traces every lane it dispatches, so
counters report *dispatched* rays/samples per category — the true hardware
work. For the deterministic categories (screen, shadow, secondary sample
spawns) this matches the reference's counts of rays it chose to trace; for
the Russian-roulette walk, `monte` counts live lanes per bounce, exactly
like the reference's per-hop monte_ray_count++ (montecarlo.cpp walk loop).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

# counter vector indices.  DROPPED_GATHER = photon-map request-queue
# overflow (deferred gather capacity); DROPPED_LANES = surviving walk
# lanes beyond a compaction stage's width — distinct loss modes with
# distinct remedies (-gather_queue_cap vs stage widths), counted apart
# (ADVICE r3).
(SCREEN, SHADOW, MONTE, TRANSMISSIVE, SPECULAR, INDIRECT, CAUSTIC,
 DROPPED_GATHER, DROPPED_LANES) = range(9)
N_COUNTERS = 9

_LABELS = (
    ("# Screen Rays", SCREEN),
    ("# Shadow Rays", SHADOW),
    ("# Monte Carlo Rays", MONTE),
    ("# Transmissive Samples", TRANSMISSIVE),
    ("# Specular Samples", SPECULAR),
    ("# Indirect Samples", INDIRECT),
    ("# Caustic Samples", CAUSTIC),
)


@dataclass
class RenderStats:
    """Host-side accumulator over per-tile device counter vectors."""
    counts: list = field(default_factory=lambda: [0] * N_COUNTERS)
    seconds: float = 0.0

    def add(self, vec) -> None:
        import numpy as np
        v = np.asarray(vec, np.int64)
        # tolerate shorter vectors (counters recorded before a counter
        # was added, e.g. replayed from checkpoints or older callers)
        for i in range(min(N_COUNTERS, v.shape[0])):
            self.counts[i] += int(v[i])

    @property
    def total(self) -> int:
        return sum(self.counts)

    def rays_per_second(self) -> float:
        return self.total / max(self.seconds, 1e-9)

    def report(self, cfg) -> str:
        """Reference-shaped verbose block (render.cpp:228-253)."""
        gates = {
            SCREEN: True,
            SHADOW: cfg.shadows,
            MONTE: cfg.monte_carlo,
            TRANSMISSIVE: cfg.transmissive_illum,
            SPECULAR: cfg.specular_illum,
            INDIRECT: cfg.indirect_illum,
            CAUSTIC: cfg.caustic_illum,
        }
        lines = []
        total = 0
        for label, idx in _LABELS:
            if gates[idx]:
                lines.append(f"  {label} = {self.counts[idx]}")
                total += self.counts[idx]
        lines.append(f"Total Rays: {total}")
        if self.counts[DROPPED_GATHER]:
            lines.append(f"  !! Dropped Gather Requests = "
                         f"{self.counts[DROPPED_GATHER]} (queue overflow; "
                         f"photon-map energy missing)")
        if self.counts[DROPPED_LANES]:
            lines.append(f"  !! Dropped Walk Lanes = "
                         f"{self.counts[DROPPED_LANES]} (survivors beyond "
                         f"a compaction stage width; path energy missing)")
        if self.seconds > 0:
            lines.append(f"  ({total / self.seconds:,.0f} rays/s)")
        return "\n".join(lines)


class PhaseTimer:
    """Wall-clock phase timers (the reference's RNTime usage)."""

    def __init__(self) -> None:
        self.phases: dict[str, float] = {}
        self._start: dict[str, float] = {}

    def start(self, name: str) -> None:
        self._start[name] = time.time()

    def stop(self, name: str) -> float:
        dur = time.time() - self._start.pop(name)
        self.phases[name] = self.phases.get(name, 0.0) + dur
        return dur
