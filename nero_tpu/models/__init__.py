"""Model-level systems: stateful wrappers that own params + device data and
expose jitted train/test steps. The registry mirrors the reference's
name2renderer (network/renderer.py:917-920)."""


def get_model(name: str):
    if name == "shape":
        from nero_tpu.models.shape import NeROShapeModel
        return NeROShapeModel
    if name == "material":
        from nero_tpu.models.material import NeROMaterialModel
        return NeROMaterialModel
    raise NotImplementedError(name)
