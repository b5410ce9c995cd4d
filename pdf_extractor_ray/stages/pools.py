"""Pool-sizing helpers shared by the actor-pool stages."""

from __future__ import annotations


def clamp_pool(n: int) -> int:
    """Clamp a FIXED actor-pool size to the live cluster CPU count
    MINUS a read-stage reserve (~1/8 of CPUs, min 1) — a fixed pool
    that takes every CPU starves the upstream read tasks and the
    streaming pipeline deadlocks (a pool larger than the cluster never
    even schedules). Fixed (not autoscaling) pools measured ~20%
    faster on short jobs: all actors spawn at t0 instead of
    serializing scale-up decisions.

    Only the ACTOR-pool stages need this (verifier / consensus /
    multimodal featurizers — expensive or mutable state). The flagship
    extraction stage is a TASK pool with a per-worker cache: state
    (compiled regexes) is cheap and read-only, so prestarted workers
    amortize construction with zero actor-spawn cost and no pool-size
    split against the read stage."""
    import ray as _ray

    if _ray.is_initialized():
        avail = int(_ray.cluster_resources().get("CPU", n))
        reserve = max(1, avail // 8)
        return max(1, min(n, avail - reserve))
    return max(1, n)
