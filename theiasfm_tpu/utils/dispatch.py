"""Device-dispatch accounting for the host-orchestrated pipelines.

The reference amortizes per-item work with a thread pool
(ref estimate_track.cc:172-191, feature_matcher.cc:116-123); the
TPU-native analog is batching many items into one device call. This
counter makes the batching measurable: every pipeline-level device
dispatch site calls count_dispatch(site) so e2e runs can report how
many device round trips they cost (each one pays host->device latency,
which dominates small-problem wall time on tunneled runners).
"""
from __future__ import annotations

import collections
from typing import Dict

_counts: Dict[str, int] = collections.Counter()


def count_dispatch(site: str, n: int = 1) -> None:
    _counts[site] += n


def dispatch_counts() -> Dict[str, int]:
    return dict(_counts)


def total_dispatches() -> int:
    return sum(_counts.values())


def reset_dispatch_counts() -> None:
    _counts.clear()
