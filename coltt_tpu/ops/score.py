"""0-100 score normalization.

Reference parity: ``core/core_helper.go:250-255`` and
``edge/edge_helper.go:143-148`` — cosine ``((2-d)/2)*100``, euclidean
``max(0, 100-d)`` (d = squared distance). Both engines share the formulas.
"""

from __future__ import annotations

import jax.numpy as jnp

from coltt_tpu.ops.distance import Metric


def normalize_score(dist, metric: Metric):
    """distance -> similarity score on the reference's 0-100 scale."""
    metric = Metric.parse(metric)
    if metric == Metric.COSINE:
        return ((2.0 - dist) / 2.0) * 100.0
    return jnp.maximum(0.0, 100.0 - dist)


def denormalize_score(score, metric: Metric):
    """score -> distance (inverse of :func:`normalize_score`)."""
    metric = Metric.parse(metric)
    if metric == Metric.COSINE:
        return 2.0 - (score / 100.0) * 2.0
    return 100.0 - score
