"""Blender (bpy) helpers: scene reset, Cycles setup, env light, orbit cameras.

Runs INSIDE Blender's bundled Python (parity: reference
blender_backend/blender_utils.py — Cycles GPU config, HDR world lighting,
look-at orbit poses). Original implementation against the public bpy API.
"""
import math

import bpy
from mathutils import Vector


def reset_scene():
    bpy.ops.object.select_all(action="SELECT")
    bpy.ops.object.delete()
    for block_list in (bpy.data.meshes, bpy.data.materials, bpy.data.images):
        for block in list(block_list):
            if block.users == 0:
                block_list.remove(block)


def setup_cycles(samples: int = 1024, resolution: int = 800, transparent: bool = True):
    scene = bpy.context.scene
    scene.render.engine = "CYCLES"
    scene.cycles.samples = samples
    scene.render.resolution_x = resolution
    scene.render.resolution_y = resolution
    scene.render.film_transparent = transparent
    scene.render.image_settings.file_format = "PNG"
    scene.render.image_settings.color_mode = "RGBA" if transparent else "RGB"
    # prefer GPU if a backend is available; fall back to CPU silently
    try:
        prefs = bpy.context.preferences.addons["cycles"].preferences
        for backend in ("CUDA", "OPTIX", "HIP", "METAL", "ONEAPI"):
            try:
                prefs.compute_device_type = backend
                prefs.get_devices()
                if any(d.type != "CPU" for d in prefs.devices):
                    for d in prefs.devices:
                        d.use = True
                    scene.cycles.device = "GPU"
                    return
            except Exception:
                continue
    except Exception:
        pass
    scene.cycles.device = "CPU"


def set_env_light(hdr_path: str, strength: float = 1.0):
    world = bpy.context.scene.world
    if world is None:
        world = bpy.data.worlds.new("World")
        bpy.context.scene.world = world
    world.use_nodes = True
    nodes = world.node_tree.nodes
    links = world.node_tree.links
    nodes.clear()
    env = nodes.new("ShaderNodeTexEnvironment")
    env.image = bpy.data.images.load(hdr_path)
    bg = nodes.new("ShaderNodeBackground")
    bg.inputs["Strength"].default_value = strength
    out = nodes.new("ShaderNodeOutputWorld")
    links.new(env.outputs["Color"], bg.inputs["Color"])
    links.new(bg.outputs["Background"], out.inputs["Surface"])


def look_at(camera, target: Vector):
    direction = target - camera.location
    camera.rotation_euler = direction.to_track_quat("-Z", "Y").to_euler()


def orbit_camera_positions(n_frames: int, radius: float = 3.0, elevation: float = 0.3):
    out = []
    for i in range(n_frames):
        az = 2 * math.pi * i / n_frames
        out.append(Vector((radius * math.cos(az) * math.cos(elevation),
                           radius * math.sin(az) * math.cos(elevation),
                           radius * math.sin(elevation))))
    return out


def add_camera(fov_deg: float = 40.0):
    cam_data = bpy.data.cameras.new("cam")
    cam_data.angle = math.radians(fov_deg)
    cam = bpy.data.objects.new("cam", cam_data)
    bpy.context.collection.objects.link(cam)
    bpy.context.scene.camera = cam
    return cam
