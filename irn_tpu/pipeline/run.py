"""Pipeline orchestrator CLI (the run_sample.py equivalent).

Usage:
    python -m irn_tpu.pipeline.run --voc12_root <VOCdevkit/VOC2012> \
        --train_cam_pass --make_cam_pass --eval_cam_pass ...

Stage names and artifact layout match the reference so users can switch
frameworks mid-pipeline. Stage flags are real booleans (run_sample.py's
string-typed flags could only ever disable stages); every stage is
idempotent and skips per-image outputs that already exist (--overwrite to
redo)."""

from __future__ import annotations

import argparse
import dataclasses
import os

from irn_tpu.pipeline.config import Config
from irn_tpu.utils.logging import Logger, Timer


def _add_flag(parser: argparse.ArgumentParser, name: str, field) -> None:
    t = field.type if isinstance(field.type, str) else getattr(
        field.type, "__name__", "str"
    )
    if t == "bool":
        parser.add_argument(
            f"--{name}", action=argparse.BooleanOptionalAction,
            default=field.default,
        )
    elif name == "cam_scales":
        parser.add_argument(
            f"--{name}", type=float, nargs="+", default=list(field.default)
        )
    else:
        ftype = {"int": int, "float": float}.get(t, str)
        parser.add_argument(f"--{name}", type=ftype, default=field.default)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="irn_tpu pipeline", allow_abbrev=False
    )
    for f in dataclasses.fields(Config):
        _add_flag(parser, f.name, f)
    return parser


def config_from_args(argv=None) -> Config:
    args = build_parser().parse_args(argv)
    kw = vars(args)
    kw["cam_scales"] = tuple(kw["cam_scales"])
    return Config(**kw).resolve()


def maybe_init_distributed(cfg: Config) -> None:
    """Join the multi-host process group when configured (SURVEY 2.7).

    Must run before any JAX backend touch (first jax.devices()); after it,
    jax.devices() spans the whole slice/pod and jax.process_index()/count()
    drive the loaders' batch-row split and the make-stages' host sharding
    (common.host_shard_range). No-op unless --dist_initialize or a
    coordinator address is configured."""
    if not (cfg.dist_initialize or cfg.dist_coordinator):
        return
    import jax

    kw = {}
    if cfg.dist_coordinator:
        kw["coordinator_address"] = cfg.dist_coordinator
    if cfg.dist_num_processes > 0:
        kw["num_processes"] = cfg.dist_num_processes
    if cfg.dist_process_id >= 0:
        kw["process_id"] = cfg.dist_process_id
    jax.distributed.initialize(**kw)
    print(
        f"distributed: process {jax.process_index()}/{jax.process_count()}, "
        f"{len(jax.local_devices())} local / {len(jax.devices())} global "
        "devices", flush=True,
    )


STAGES = [
    ("train_cam_pass", "irn_tpu.pipeline.stages_cam", "train_cam"),
    ("make_cam_pass", "irn_tpu.pipeline.stages_cam", "make_cam"),
    ("eval_cam_pass", "irn_tpu.pipeline.stages_cam", "eval_cam"),
    ("cam_to_ir_label_pass", "irn_tpu.pipeline.stages_cam", "cam_to_ir_label"),
    ("train_irn_pass", "irn_tpu.pipeline.stages_irn", "train_irn"),
    ("make_ins_seg_pass", "irn_tpu.pipeline.stages_irn", "make_ins_seg_labels"),
    ("eval_ins_seg_pass", "irn_tpu.pipeline.stages_eval", "eval_ins_seg"),
    ("make_sem_seg_pass", "irn_tpu.pipeline.stages_irn", "make_sem_seg_labels"),
    ("eval_sem_seg_pass", "irn_tpu.pipeline.stages_eval", "eval_sem_seg"),
    ("make_cocoann_pass", "irn_tpu.pipeline.stages_eval", "make_cocoann"),
]


def run_pipeline(cfg: Config) -> None:
    os.makedirs(cfg.session_dir, exist_ok=True)
    for d in (cfg.cam_out_dir, cfg.ir_label_out_dir, cfg.sem_seg_out_dir,
              cfg.ins_seg_out_dir):
        os.makedirs(d, exist_ok=True)

    if cfg.compile_cache_dir:
        import jax

        jax.config.update("jax_compilation_cache_dir", cfg.compile_cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    for flag, module_name, fn_name in STAGES:
        if not getattr(cfg, flag):
            continue
        import importlib

        module = importlib.import_module(module_name)
        print(f"step.{fn_name}:", flush=True)
        timer = Timer()
        getattr(module, fn_name)(cfg)
        print(f"step.{fn_name} done in {timer.lapse():.1f}s", flush=True)


def main(argv=None) -> None:
    cfg = config_from_args(argv)
    maybe_init_distributed(cfg)
    log_name = cfg.log_name
    if cfg.dist_initialize or cfg.dist_coordinator:
        import jax

        if jax.process_index() > 0:  # one log file per process
            log_name = f"{log_name}.p{jax.process_index()}"
    logger = Logger(log_name + ".log")
    try:
        print(dataclasses.asdict(cfg))
        run_pipeline(cfg)
    finally:
        logger.close()


if __name__ == "__main__":
    main()
