"""Segmentation workflow driver: TOML config -> ws/mws/cc segmentation.

Equivalent of the reference segment driver (reference
``bootstrapper/segment.py:85-216``): method defaults, ``-p key=value``
overrides, in-memory path for small volumes, blockwise path (4-stage
hglom / mutex pipelines) for large ones.  Segmentation dataset names
encode method + parameters like the reference's
``{merge_function}--{threshold}`` scheme.
"""

from __future__ import annotations

import logging
import os
from ast import literal_eval
from typing import Optional

import numpy as np

from ..core.arrays import open_ds, prepare_ds
from ..core.geometry import Roi
from ..post.blockwise_seg import (
    _fmt_threshold,
    cc_pipeline_blockwise,
    mws_pipeline_blockwise,
    waterz_pipeline_blockwise,
)
from ..post.segment import (
    METHOD_DEFAULTS,
    cc_segmentation,
    mws_segmentation,
    waterz_segmentation,
)
from ..utils import tomlio

logger = logging.getLogger(__name__)


def get_seg_config(cfg: dict, method: str, param_overrides=()) -> dict:
    params = dict(METHOD_DEFAULTS.get(method, {}))
    params.update(cfg.get(f"{method}_params", {}))
    for kv in param_overrides:
        k, v = kv.split("=", 1)
        try:
            params[k] = literal_eval(v)
        except (ValueError, SyntaxError):
            params[k] = v
    return params


def run_segmentation(
    config_file: str,
    mode: str = "ws",
    volume: Optional[str] = None,
    param_overrides=(),
    roi_offset=None,
    roi_shape=None,
    blockwise: Optional[bool] = None,
    num_workers: Optional[int] = None,
    block_shape=None,
    context=None,
    require_params: bool = False,
) -> dict:
    """Kwargs override per-volume config values (reference
    ``segment.py:145-183`` CLI option surface)."""
    cfg_all = tomlio.load(config_file)
    cfg_all = cfg_all.get("segment", cfg_all)
    results = {}
    for volume_name, cfg in cfg_all.items():
        if volume is not None and volume_name != volume:
            continue
        if require_params and cfg.get(f"{mode}_params") is None:
            # auto-detected method: only run it on volumes that
            # configured it (reference segment.py:199-213 semantics)
            continue
        cfg = dict(cfg)
        if (roi_offset is None) != (roi_shape is None):
            raise ValueError(
                "--roi-offset and --roi-shape must be given together"
            )
        if roi_offset is not None:
            cfg["roi_offset"] = list(roi_offset)
            cfg["roi_shape"] = list(roi_shape)
        if blockwise is not None:
            cfg["blockwise"] = blockwise
        if num_workers is not None:
            cfg["num_workers"] = num_workers
        if block_shape is not None:
            cfg["block_shape"] = list(block_shape)
        if context is not None:
            cfg["context"] = list(context)
        params = get_seg_config(cfg, mode, param_overrides)
        affs_path = cfg["affs_dataset"]
        # local name: assigning to the ``blockwise`` parameter here would
        # leak volume N's resolved value into volume N+1's override check
        vol_blockwise = cfg.get("blockwise", False)
        out_container = os.path.dirname(cfg["seg_dataset_prefix"])
        roi = None
        if "roi_offset" in cfg:
            roi = Roi(cfg["roi_offset"], cfg["roi_shape"])

        if vol_blockwise:
            # multi-process scale-out: N crash-isolated subprocesses over
            # stride-shards of the block grid (daisy worker analog)
            workers = int(params.pop("workers", cfg.get("workers", 1)) or 1)
            block_stride = int(params.pop("block_stride", 1))
            block_offset = int(params.pop("block_offset", 0))
            ledger = params.pop("ledger", cfg.get("ledger"))
            shard_kw = dict(
                workers=workers, block_stride=block_stride,
                block_offset=block_offset, ledger=ledger,
                # RAG backend: -p "db={'db_name':...,'db_host':...}" (or a
                # [db] table in the config) routes the pipeline's RAG to
                # PostgreSQL via open_rag; default stays the SQLite file
                db=params.pop("db", cfg.get("db")),
            )
            if mode == "ws":
                segs = waterz_pipeline_blockwise(
                    affs_path,
                    out_container,
                    block_shape=tuple(cfg.get("block_shape", (32, 256, 256))),
                    context_voxels=tuple(cfg.get("context", (2, 32, 32))),
                    thresholds=params.get("thresholds", [0.5]),
                    merge_function=params.get("merge_function", "mean"),
                    fragments_in_xy=params.get("fragments_in_xy", True),
                    min_seed_distance=params.get("min_seed_distance", 10),
                    filter_fragments=params.get("filter_fragments", 0.05),
                    epsilon_agglomerate=params.get("epsilon_agglomerate", 0.0),
                    replace_sections=params.get("replace_sections"),
                    num_workers=cfg.get("num_workers", 8),
                    roi=roi,
                    **shard_kw,
                )
                results[volume_name] = {str(k): v for k, v in segs.items()}
            elif mode == "mws":
                segs = mws_pipeline_blockwise(
                    affs_path,
                    out_container,
                    neighborhood=params.get(
                        "neighborhood", params.get("aff_neighborhood")
                    ),
                    bias=params["bias"],
                    block_shape=tuple(cfg.get("block_shape", (32, 256, 256))),
                    context_voxels=tuple(cfg.get("context", (2, 32, 32))),
                    filter_fragments=params.get("filter_fragments", 0.1),
                    num_workers=cfg.get("num_workers", 8),
                    roi=roi,
                    **shard_kw,
                    sigma=params.get("sigma"),
                    noise_eps=params.get("noise_eps"),
                    strides=params.get("strides"),
                    randomized_strides=params.get("randomized_strides", False),
                    # -p "global_bias_sweep=[[-0.4,-0.7],[-0.6,-0.85]]":
                    # sweep global (adj, lr) operating points over one
                    # RAG; evaluate picks the best, like ws thresholds
                    global_bias_sweep=params.get("global_bias_sweep"),
                )
                results[volume_name] = segs
            elif mode == "cc":
                # beyond reference: the reference's blockwise cc raises
                # NotImplementedError (connected_components.py:8-9)
                segs = cc_pipeline_blockwise(
                    affs_path,
                    out_container,
                    threshold=params.get("threshold", 0.5),
                    remove_debris=params.get("remove_debris", 0),
                    block_shape=tuple(cfg.get("block_shape", (32, 256, 256))),
                    context_voxels=tuple(cfg.get("context", (2, 32, 32))),
                    num_workers=cfg.get("num_workers", 8),
                    roi=roi,
                    **shard_kw,
                )
                results[volume_name] = segs
            else:
                raise ValueError(f"unknown segmentation mode {mode!r}")
        else:
            affs = open_ds(affs_path)
            a = affs.to_ndarray(roi) if roi else affs.to_ndarray()
            total = roi or affs.roi
            if mode == "ws":
                segs = waterz_segmentation(
                    a,
                    thresholds=params.get("thresholds", [0.2, 0.35, 0.5]),
                    merge_function=params.get("merge_function", "mean"),
                    fragments_in_xy=params.get("fragments_in_xy", True),
                    min_seed_distance=params.get("min_seed_distance", 10),
                )
                out = {}
                for t, seg in segs.items():
                    name = (
                        f"{cfg['seg_dataset_prefix']}/"
                        f"{params.get('merge_function', 'mean')}--"
                        f"{_fmt_threshold(t)}"
                    )
                    _write_seg(name, seg, affs, total)
                    out[str(t)] = name
                results[volume_name] = out
            elif mode == "mws":
                nbhd = params.get(
                    "neighborhood", params.get("aff_neighborhood")
                )
                # -p "bias_sweep=[[-0.4,-0.7],[-0.6,-0.85]]": (short,
                # long) pairs expanded over the neighborhood; each point
                # is a full mws run (in-memory has no reusable RAG), one
                # param-encoded dataset per point for evaluate to rank
                sweep = params.get("bias_sweep")
                if sweep is not None:
                    from ..post.blockwise_seg import mws_sweep_label

                    # map biases per offset (NOT positionally): custom
                    # neighborhoods may interleave direct-neighbour and
                    # long-range offsets — same classification as the
                    # blockwise path's is_lr
                    is_short = [
                        max(abs(int(v)) for v in o) <= 1 for o in nbhd
                    ]
                    points = [
                        (s, l, [s if sh else l for sh in is_short])
                        for s, l in sweep
                    ]
                else:
                    points = [(None, None, params["bias"])]
                out = {}
                for short_b, long_b, bias_vec in points:
                    seg = mws_segmentation(
                        a,
                        neighborhood=nbhd,
                        bias=bias_vec,
                        sigma=params.get("sigma"),
                        noise_eps=params.get("noise_eps"),
                        strides=params.get("strides"),
                        randomized_strides=params.get(
                            "randomized_strides", False
                        ),
                        remove_debris=params.get("remove_debris", 0),
                    )
                    key = (
                        "mws" if short_b is None
                        else mws_sweep_label(short_b, long_b)
                    )
                    name = f"{cfg['seg_dataset_prefix']}/{key}"
                    _write_seg(name, seg, affs, total)
                    out[key] = name
                results[volume_name] = out
            elif mode == "cc":
                seg = cc_segmentation(
                    a,
                    threshold=params.get("threshold", 0.5),
                    remove_debris=params.get("remove_debris", 0),
                )
                name = (
                    f"{cfg['seg_dataset_prefix']}/"
                    f"cc--{_fmt_threshold(params.get('threshold', 0.5))}"
                )
                _write_seg(name, seg, affs, total)
                results[volume_name] = {"cc": name}
            else:
                raise ValueError(f"unknown method {mode!r}")
    return results


def _write_seg(path: str, seg: np.ndarray, affs, roi: Roi):
    ds = prepare_ds(
        path,
        seg.shape,
        roi.offset,
        affs.voxel_size,
        np.uint64,
    )
    ds[ds.roi] = seg
