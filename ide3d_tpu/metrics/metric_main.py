"""Metric registry + dispatcher (contract: metrics/metric_main.py:29-148).

Registered names mirror the reference suite: fid<N>, kid<N>, pr<N>k3, ppl2_wend,
is<N> — parameterized by item count instead of hardcoded 50k variants (the
reference's fid50k_full == fid(num_items=50000) here). JSONL result reporting
matches metric_main.py:70-82.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict

from .metric_utils import MetricOptions

_metric_dict: Dict[str, Callable] = {}


def register_metric(fn: Callable) -> Callable:
    assert callable(fn)
    _metric_dict[fn.__name__] = fn
    return fn


def list_metrics():
    return list(_metric_dict.keys())


def is_valid_metric(name: str) -> bool:
    return name in _metric_dict


def calc_metric(metric: str, run_dir: str = None, **kwargs) -> dict:
    assert is_valid_metric(metric), f"unknown metric {metric}; have {list_metrics()}"
    opts = MetricOptions(**kwargs)
    t0 = time.time()
    results = _metric_dict[metric](opts)
    total_time = time.time() - t0

    record = {
        "results": results,
        "metric": metric,
        "total_time": total_time,
        "num_items": opts.num_items,
    }
    if run_dir is not None:
        os.makedirs(run_dir, exist_ok=True)
        with open(os.path.join(run_dir, f"metric-{metric}.jsonl"), "a") as f:
            f.write(json.dumps(record, default=float) + "\n")
    return record


# --------------------------------------------------------------------- registry


@register_metric
def fid(opts: MetricOptions):
    from .frechet_inception_distance import compute_fid

    return {"fid": compute_fid(opts)}


@register_metric
def kid(opts: MetricOptions):
    from .kernel_inception_distance import compute_kid

    return {"kid": compute_kid(opts)}


@register_metric
def pr(opts: MetricOptions):
    from .precision_recall import compute_pr

    precision, recall = compute_pr(opts)
    return {"precision": precision, "recall": recall}


@register_metric
def ppl2_wend(opts: MetricOptions):
    from .perceptual_path_length import compute_ppl

    return {"ppl2_wend": compute_ppl(opts)}


@register_metric
def eqt(opts: MetricOptions):
    from .equivariance import compute_eqt

    return {"eqt_psnr_db": compute_eqt(opts)}


@register_metric
def eqr(opts: MetricOptions):
    from .equivariance import compute_eqr

    return {"eqr_psnr_db": compute_eqr(opts)}


@register_metric
def inception_score(opts: MetricOptions):
    from .inception_score import compute_is

    mean, std = compute_is(opts)
    return {"is_mean": mean, "is_std": std}
