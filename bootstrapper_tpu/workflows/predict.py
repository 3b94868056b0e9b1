"""Prediction workflow driver: TOML config -> chained tiled inference.

Equivalent of the reference predict driver (reference
``bootstrapper/predict.py:20-269``): per volume, run each setup in the
chain (image model, then refiners consuming the previous outputs),
preparing uint8 output Zarrs chunked to the inference tile.  The
reference's multi-GPU daisy path maps to ``batch_tiles`` batching on
one chip plus the blockwise engine's grid sharding for multi-process
runs.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

from ..core.arrays import open_ds
from ..core.geometry import Roi
from ..models.model import Model
from ..predict.scan import Predictor, prepare_prediction_outputs
from ..train.loop import latest_checkpoint, load_params
from ..utils import tomlio

logger = logging.getLogger(__name__)


def _find_checkpoint(setup_dir: str, iteration) -> str:
    explicit = iteration not in (None, "latest")
    if explicit:
        path = os.path.join(setup_dir, f"model_checkpoint_{iteration}")
        if os.path.exists(path):
            return path
    latest = latest_checkpoint(setup_dir)
    if latest is None:
        raise FileNotFoundError(
            f"no checkpoint in {setup_dir} (wanted iteration {iteration})"
        )
    if explicit:
        # only a real (missing) iteration warrants a warning — the
        # 'latest' default is not a literal checkpoint name
        logger.warning(
            "checkpoint iteration %s not found; using %s", iteration, latest
        )
    return latest


def _align_chain_inputs(model, arrays, labels):
    """Match chained input arrays to the model's declared inputs by NAME.

    ``net_config['inputs']`` is an ordered mapping (e.g. 2d_lsds then
    2d_affs for 3d_affs_from_2d_mtlsd); the tile reader concatenates
    arrays positionally, so a reordered ``input_datasets`` list or
    outputs dict would silently swap channel groups — both halves are
    often the same width (6+6), so the conv succeeds and garbage is
    written. The reference matches datasets by name
    (``predict.py:246-265``); same here: reorder by name when every
    declared input matches exactly one array, then validate channel
    widths and fail loudly on a mismatch.
    """
    declared = [
        (k, int(v.get("dims", 1)))
        for k, v in model.net_config.get("inputs", {}).items()
    ]
    if not declared or (len(declared) <= 1 and len(arrays) == 1):
        return arrays, labels

    def _ch(a):
        return a.shape[0] if len(a.shape) == len(a.roi.shape) + 1 else 1

    base = [os.path.basename(os.path.normpath(str(l))) for l in labels]
    picks = []
    for name, _ in declared:
        hits = [i for i, b in enumerate(base) if name in b]
        if len(hits) != 1:
            picks = None
            break
        picks.append(hits[0])
    if picks is not None and len(set(picks)) == len(picks):
        # Name matching also SELECTS when more datasets arrive than the
        # model declares (a refiner taking a subset of the previous
        # setup's outputs, e.g. 2d_mtlsd -> 3d_affs_from_2d_affs).
        arrays = [arrays[i] for i in picks]
        labels = [labels[i] for i in picks]
    elif len(arrays) != len(declared):
        raise ValueError(
            f"chain link expects {len(declared)} input dataset(s) "
            f"{[n for n, _ in declared]} but input_datasets provides "
            f"{len(arrays)} ({list(map(str, labels))}) and they cannot "
            "be matched by name; list exactly the declared inputs (or "
            "name datasets after them)"
        )
    widths = [_ch(a) for a in arrays]
    want = [d for _, d in declared]
    if widths != want:
        raise ValueError(
            f"chain inputs {list(labels)} have channel widths {widths} "
            f"but the model declares inputs {declared}; order "
            "input_datasets to match (or name datasets after the "
            "declared inputs so they can be matched)"
        )
    return arrays, labels


def _maybe_zstream(
    model, params, raw, out_vox, fit_tile, tiled_out_z,
    tiled_out_xy=None, devices=None,
):
    """ZStreamPredictor when overlap-save z streaming applies, else None.

    Streaming needs a 3D net that never pools z and a volume deeper than
    one tiled z pass (``tiled_out_z`` — a single tiled pass already pays
    the z context exactly once, so streaming shallower volumes only adds
    a second executable).  In lockstep multi-device mode, volumes with
    fewer xy columns than devices split each column's z walk into
    per-device segments (``plan_z_groups``); streaming is used whenever
    its estimated per-voxel overhead (warm z-context per segment + idle
    devices in short groups) stays below the tiled path's z-context
    recompute factor.  The stream retiles on its own memory model: the
    z step is a free parameter, so freed HBM funds wider xy tiles than
    the tiled auto-tile picks (``plan_stream``).
    """
    if os.environ.get("BS_ZSTREAM", "1") != "1":
        return None
    from ..models.zstream import stream_eligible
    from ..predict.zstream import (
        ZStreamPredictor,
        plan_stream,
        plan_z_groups,
    )

    if model.dims != 3 or not stream_eligible(model.unet_config):
        return None
    if out_vox[0] <= tiled_out_z:
        return None
    nc = model.net_config
    ctx_z = nc["input_shape"][0] - nc["output_shape"][0]
    ctx_xy = nc["input_shape"][1] - nc["output_shape"][1]
    n_dev = len(devices) if devices is not None else 1

    def columns(inc):
        out_shape = [a + b for a, b in zip(nc["output_shape"], inc)]
        n = 1
        for v, t in zip(out_vox[1:], out_shape[1:]):
            n *= -(-v // t)
        return n, out_shape

    # Two candidate plans: (a) xy tiles shrunk until every device gets
    # a column; (b) widest xy tiles, mesh filled by z-segmenting each
    # column (plan_z_groups).  Compare on estimated device-work per
    # output voxel — z overhead (warm context + idle padding) times xy
    # context overhead — and stream only if the winner also beats the
    # tiled path's recompute factor.
    # operator override: the static model cannot see XLA execution
    # cliffs (round-5 A/B: a 692-wide stream steady graph ran 130x
    # slower per step than the 388-wide alternative) — force a plan
    # family when a production run hits one. BOTH measured A/B shapes'
    # winner was the narrow/many-columns plan.
    plan_force = os.environ.get("BS_ZSTREAM_PLAN", "auto")
    min_cols_cands = {n_dev, 1}
    if plan_force == "narrow":
        min_cols_cands = {n_dev}
    elif plan_force == "wide":
        min_cols_cands = {1}

    cands = []
    for min_cols in min_cols_cands:
        inc, step, warm = plan_stream(
            nc, out_vox, min_columns=min_cols
        )
        inc = fit_tile(inc)
        ncols, out_shape = columns(inc)
        if n_dev > 1:
            _, _, zf = plan_z_groups(
                out_vox[0], ncols, n_dev, step, warm, ctx_z
            )
        else:
            zf = 1.0  # single device: whole-volume stream, no warm split
        xyf = ((out_shape[1] + ctx_xy) / out_shape[1]) * (
            (out_shape[2] + ctx_xy) / out_shape[2]
        )
        # ragged-column overcompute: lockstep columns run the FULL xy
        # tile even where it overhangs the volume, so a plan's real
        # device work scales with ncols * tile_area / volume_area.
        # Omitting this term made the model pick the measured-10%-
        # slower wide plan at (1200,764,764)x8dev (round-5 on-chip
        # A/B, tools/zplan_ab_probe.py: model 1.46x pro-wide vs
        # measured 0.91x pro-narrow; with this term + the measured
        # warm factor the model matches the measured winner).
        coverage = (ncols * out_shape[1] * out_shape[2]) / max(
            out_vox[1] * out_vox[2], 1
        )
        cands.append((zf * xyf * coverage, inc, step, warm, ncols))
    total, s_inc, s_step, s_warm, n_cols = min(cands)
    if n_dev > 1:
        tiled_total = ((tiled_out_z + ctx_z) / tiled_out_z) * (
            ((tiled_out_xy + ctx_xy) / tiled_out_xy) ** 2
            if tiled_out_xy
            else 1.0
        )
        if tiled_out_xy:
            # same ragged-coverage accounting as the stream candidates
            # (edge tiles compute the full compiled tile too)
            tiled_total *= (
                -(-out_vox[1] // tiled_out_xy) * tiled_out_xy
                * (-(-out_vox[2] // tiled_out_xy)) * tiled_out_xy
                / max(out_vox[1] * out_vox[2], 1)
            ) * (
                -(-out_vox[0] // tiled_out_z) * tiled_out_z / out_vox[0]
            )
        if total >= tiled_total:
            logger.info(
                "z-stream overhead %.3f >= tiled %.3f (%d columns / "
                "%d devices): tiled sharding instead",
                total, tiled_total, n_cols, n_dev,
            )
            return None
    predictor = ZStreamPredictor(
        model, params, raw.voxel_size, shape_increase=s_inc,
        devices=devices, step_z=s_step, warm_step_z=s_warm,
    )
    logger.info(
        "z-streaming inference over %d device(s) (%d-slice steps, "
        "%d columns, %s input tile)",
        n_dev, predictor.s, n_cols,
        "x".join(map(str, predictor.input_tile)),
    )
    return predictor


def run_prediction(
    config_file: str,
    volume: Optional[str] = None,
    batch_tiles: Optional[int] = None,
    sharded=None,  # falsy | "batch" | "spatial"
    auto_tile: bool = False,
    roi_offset=None,
    roi_shape=None,
    setup_id: Optional[str] = None,
) -> dict:
    """Run the prediction chain(s) from a config.  ``setup_id``
    restricts to chain links whose setup name contains it, reading that
    link's configured input datasets from disk (reference
    ``predict.py:246-265`` capability: re-run one setup of a chain)."""
    cfg = tomlio.load(config_file)
    cfg = cfg.get("predict", cfg)
    results = {}
    for volume_name, vcfg in cfg.items():
        if volume is not None and volume_name != volume:
            continue
        raw = open_ds(vcfg["raw_dataset"])
        container = vcfg["output_container"]
        roi = None
        if roi_offset is not None:
            roi = Roi(roi_offset, roi_shape)
        elif "roi_offset" in vcfg:
            roi = Roi(vcfg["roi_offset"], vcfg["roi_shape"])

        prev_arrays = [raw]
        prev_labels = ["raw"]
        for idx, link in enumerate(vcfg["chain"]):
            setup_dir = link["setup_dir"]
            setup_name = os.path.basename(os.path.normpath(setup_dir))
            if setup_id is not None:
                if setup_id not in setup_name:
                    continue
                ins = link.get("input_datasets")
                if ins:
                    prev_arrays = [open_ds(p) for p in ins]
                    prev_labels = list(ins)
                elif idx > 0:
                    # skipped earlier links leave prev_arrays == [raw];
                    # running a refiner on raw would be silently wrong
                    raise ValueError(
                        f"--setup-id {setup_id!r} selects chain link "
                        f"{idx} ({setup_name}) but the config has no "
                        "input_datasets for it; add them so the model "
                        "gets its real inputs"
                    )
            model = Model.from_setup(setup_dir)
            prev_arrays, prev_labels = _align_chain_inputs(
                model, prev_arrays, prev_labels
            )
            ckpt = _find_checkpoint(
                setup_dir, link.get("checkpoint_iteration", "latest")
            )
            params = load_params(ckpt)

            # output roi: shrink by total context of the chain so far
            in_roi = prev_arrays[0].roi
            for a in prev_arrays[1:]:
                in_roi = in_roi.intersect(a.roi)
            out_roi = in_roi if roi is None else roi
            out_vox = tuple(
                s // v for s, v in zip(out_roi.shape, raw.voxel_size)
            )

            def fit_tile(inc):
                """Shrink the tile when the output roi is smaller than
                one output tile (reference fit="shrink" analog)."""
                from ..predict.scan import shrink_shape_increase

                fitted = shrink_shape_increase(model, out_vox, inc)
                if fitted != list(
                    inc
                    if inc is not None
                    else model.net_config.get(
                        "shape_increase", [0] * model.dims
                    )
                ):
                    logger.info(
                        "roi smaller than one tile: shape_increase "
                        "shrunk to %s", fitted,
                    )
                return fitted

            shape_increase = None
            if auto_tile:
                from ..predict.scan import auto_shape_increase

                shape_increase = auto_shape_increase(
                    model.net_config, raw.spatial_shape
                )
                logger.info("auto tile: shape_increase=%s", shape_increase)
            if sharded == "spatial":
                import jax

                from ..predict.spatial import (
                    SpatialShardedPredictor,
                    spatial_shape_increase,
                )

                if shape_increase is None and model.dims == 3:
                    shape_increase = spatial_shape_increase(
                        model.net_config, len(jax.devices()),
                        raw.spatial_shape,
                    )
                    logger.info(
                        "spatial tile: shape_increase=%s", shape_increase
                    )
                shape_increase = fit_tile(shape_increase)
                predictor = SpatialShardedPredictor(
                    model, params, raw.voxel_size,
                    shape_increase=shape_increase,
                )
                logger.info(
                    "spatially-sharded inference over %d devices "
                    "(axis %d, halo %s)",
                    len(jax.devices()), predictor.shard_axis,
                    predictor.halo,
                )
            elif sharded:
                import jax

                fitted = fit_tile(shape_increase)
                n_dev = len(jax.devices())
                # deep volumes with enough xy columns to fill the mesh
                # stream one column per device in lockstep — same SPMD
                # scaling as batch-of-tiles, plus the zero-redundant-z-
                # compute win (predict/zstream.py)
                predictor = _maybe_zstream(
                    model, params, raw, out_vox, fit_tile,
                    tiled_out_z=model.net_config["output_shape"][0]
                    + fitted[0],
                    tiled_out_xy=model.net_config["output_shape"][1]
                    + fitted[1],
                    devices=jax.devices(),
                )
                if predictor is None:
                    from ..predict.sharded import ShardedPredictor

                    predictor = ShardedPredictor(
                        model, params, raw.voxel_size,
                        shape_increase=fitted,
                    )
                    logger.info(
                        "sharded inference over %d devices", n_dev
                    )
            else:
                fitted = fit_tile(shape_increase)
                # overlap-save z streaming on volumes deeper than one
                # tiled z pass; an explicit --batch-tiles asks for the
                # tiled predictor's batching, so it opts out
                predictor = None
                if batch_tiles is None:
                    predictor = _maybe_zstream(
                        model, params, raw, out_vox, fit_tile,
                        tiled_out_z=model.net_config["output_shape"][0]
                        + fitted[0],
                    )
                if predictor is None:
                    predictor = Predictor(
                        model,
                        params,
                        raw.voxel_size,
                        shape_increase=fitted,
                        batch_tiles=batch_tiles,
                    )
            # keep out roi at least one tile big
            min_size = predictor.output_size
            if any(
                s < m for s, m in zip(out_roi.shape, min_size)
            ):
                raise ValueError(
                    f"roi {out_roi} smaller than one output tile {min_size}"
                )
            outputs = prepare_prediction_outputs(
                container,
                model,
                out_roi,
                raw.voxel_size,
                dataset_prefix=link["output_prefix"] + "/",
                predictor=predictor,
            )
            stats = predictor.predict(prev_arrays, outputs, out_roi)
            logger.info(
                "%s / %s: %d tiles, %.2f Mvox/s",
                volume_name, os.path.basename(setup_dir),
                stats["tiles"], stats["voxels_per_sec"] / 1e6,
            )
            results[f"{volume_name}/{link['output_prefix']}"] = stats
            prev_arrays = list(outputs.values())
            prev_labels = list(outputs.keys())
    return results
