"""nero_tpu — a TPU-native neural inverse-rendering framework.

Re-implements the capabilities of NeRO (SIGGRAPH 2023, arXiv 2305.17398):
a two-stage pipeline that (I) reconstructs the geometry of reflective
objects as a NeuS-style SDF with a split-sum shading model and (II)
recovers spatially-varying BRDF (albedo / metallic / roughness) plus
environment light by Monte-Carlo integration of the rendering equation
with ray-traced visibility.

Design: JAX/XLA for the compute path (pure-function networks as pytrees,
fixed-shape masked rendering, `lax`-based control flow), Pallas kernels
for the hot ops, `jax.sharding`-based data parallelism over the ray axis,
and native C++ (BVH build, marching cubes, rasterization) for the host
geometry stack.

Quick start:
    from nero_tpu import Trainer, load_cfg
    Trainer(load_cfg("configs/shape/syn/bell.yaml")).run()
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy top-level API (keeps `import nero_tpu` free of jax initialisation)
    if name == "Trainer":
        from nero_tpu.train.trainer import Trainer
        return Trainer
    if name == "load_cfg":
        from nero_tpu.core.config import load_cfg
        return load_cfg
    if name == "get_model":
        from nero_tpu.models import get_model
        return get_model
    if name == "parse_database_name":
        from nero_tpu.dataset.database import parse_database_name
        return parse_database_name
    raise AttributeError(name)
