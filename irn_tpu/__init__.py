"""irn_tpu — a TPU-native framework for weakly-supervised semantic and instance
segmentation from image-level labels (IRNet capabilities, rebuilt for TPU).

Re-designed from scratch for JAX/XLA/Pallas on TPU meshes; the behavioral
contract (models, losses, pipeline stages, hyper-parameters, output formats)
matches the reference IRNet pipeline (jiwoon-ahn/irn, CVPR 2019).

Subpackages
-----------
- ``irn_tpu.data``      VOC12 dataset, host-side augmentation, bucketed loaders.
- ``irn_tpu.models``    Flax modules: ResNet-50 backbone (frozen BN), CAM head,
                        IRNet boundary+displacement decoders.
- ``irn_tpu.ops``       Device ops: path geometry, affinity, random-walk
                        propagation (Pallas matmul-power kernel), CRF,
                        centroid voting, connected components, resize.
- ``irn_tpu.parallel``  Mesh construction and sharding helpers (dp over ICI,
                        row-sharded transition-matrix power).
- ``irn_tpu.train``     Optax poly-SGD, CAM / IRN training steps.
- ``irn_tpu.pipeline``  Typed config + the stage registry mirroring the
                        reference's run_sample.py stage API.
- ``irn_tpu.eval``      Confusion-matrix mIoU, VOC instance AP, COCO export.
- ``irn_tpu.utils``     Logging, meters, timers, checkpointing, weight port.
"""

__version__ = "0.1.0"

# Convenience API (submodules stay lazily importable on their own)
from irn_tpu.pipeline.config import Config  # noqa: E402,F401


def run_pipeline(cfg: "Config") -> None:
    """Run configured pipeline stages (see irn_tpu.pipeline.run)."""
    from irn_tpu.pipeline.run import run_pipeline as _run

    _run(cfg)
