"""Relighting backend, executed inside Blender (bpy).

Parity: reference blender_backend/relight_backend.py — import the extracted
PLY, attach the gamma-corrected vertex materials (albedo/metallic/roughness
.npy, sRGB-encoded by extract_materials.py and inverse-gamma'd here by
Blender's vertex-color handling) to a Principled BSDF, light with an HDR
environment, render a 360-frame orbit with Cycles.

Invoke via:  blender --background --python relight_backend.py -- [args]
"""
import argparse
import os
import sys

import numpy as np

sys.path.append(os.path.dirname(os.path.abspath(__file__)))

import bpy  # noqa: E402
from blender_utils import (add_camera, look_at, orbit_camera_positions,  # noqa: E402
                           reset_scene, set_env_light, setup_cycles)
from mathutils import Vector  # noqa: E402


def parse_args():
    argv = sys.argv
    argv = argv[argv.index("--") + 1:] if "--" in argv else []
    parser = argparse.ArgumentParser()
    parser.add_argument("--name", type=str, required=True)
    parser.add_argument("--mesh", type=str, required=True)
    parser.add_argument("--material", type=str, required=True)
    parser.add_argument("--hdr", type=str, required=True)
    parser.add_argument("--output_dir", type=str, default="data/relight")
    parser.add_argument("--num_frames", type=int, default=360)
    parser.add_argument("--samples", type=int, default=1024)
    parser.add_argument("--resolution", type=int, default=800)
    parser.add_argument("--trans", action="store_true", default=False)
    return parser.parse_args(argv)


def import_mesh_with_materials(mesh_path: str, material_dir: str):
    bpy.ops.import_mesh.ply(filepath=mesh_path)
    obj = bpy.context.selected_objects[0]
    mesh = obj.data

    albedo = np.load(os.path.join(material_dir, "albedo.npy"))
    metallic = np.load(os.path.join(material_dir, "metallic.npy"))
    roughness = np.load(os.path.join(material_dir, "roughness.npy"))

    def add_color_attr(name, values):
        attr = mesh.color_attributes.new(name=name, type="FLOAT_COLOR",
                                         domain="POINT")
        rgba = np.ones((len(values), 4), np.float32)
        if values.shape[1] == 1:
            rgba[:, :3] = values
        else:
            rgba[:, :3] = values[:, :3]
        attr.data.foreach_set("color", rgba.reshape(-1))

    add_color_attr("albedo", albedo)
    add_color_attr("metallic", metallic)
    add_color_attr("roughness", roughness)

    mat = bpy.data.materials.new("nero_material")
    mat.use_nodes = True
    nodes = mat.node_tree.nodes
    links = mat.node_tree.links
    bsdf = nodes["Principled BSDF"]

    def attr_node(name):
        node = nodes.new("ShaderNodeVertexColor")
        node.layer_name = name
        return node

    links.new(attr_node("albedo").outputs["Color"], bsdf.inputs["Base Color"])
    links.new(attr_node("metallic").outputs["Color"], bsdf.inputs["Metallic"])
    links.new(attr_node("roughness").outputs["Color"], bsdf.inputs["Roughness"])
    obj.data.materials.append(mat)
    return obj


def main():
    args = parse_args()
    reset_scene()
    setup_cycles(samples=args.samples, resolution=args.resolution,
                 transparent=args.trans)
    import_mesh_with_materials(args.mesh, args.material)
    set_env_light(args.hdr)
    cam = add_camera()

    out_dir = os.path.join(args.output_dir, args.name)
    os.makedirs(out_dir, exist_ok=True)
    positions = orbit_camera_positions(args.num_frames)
    for i, pos in enumerate(positions):
        cam.location = pos
        look_at(cam, Vector((0.0, 0.0, 0.0)))
        bpy.context.scene.render.filepath = os.path.join(out_dir, f"{i}.png")
        bpy.ops.render.render(write_still=True)


if __name__ == "__main__":
    main()
