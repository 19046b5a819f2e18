"""Relight an extracted mesh + materials under a new HDR environment in Blender.

CLI parity: reference relight.py — drives Blender headless with
blender_backend/relight_backend.py. Blender is an external renderer
(ground-truth relighting); this script only shells out to it.
"""
import argparse
import os
import shutil
import subprocess
import sys


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--blender", type=str, default="blender",
                        help="path to the blender binary")
    parser.add_argument("--name", type=str, required=True,
                        help="output name, e.g. bell-neon")
    parser.add_argument("--mesh", type=str, required=True, help="mesh ply path")
    parser.add_argument("--material", type=str, required=True,
                        help="dir with {metallic,roughness,albedo}.npy")
    parser.add_argument("--hdr", type=str, required=True, help="HDR env map")
    parser.add_argument("--trans", action="store_true", dest="trans", default=False)
    flags = parser.parse_args()

    blender = shutil.which(flags.blender)
    if blender is None:
        print("error: blender binary not found; install Blender or pass --blender",
              file=sys.stderr)
        sys.exit(1)

    backend = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "blender_backend", "relight_backend.py")
    cmd = [blender, "--background", "--python", backend, "--",
           "--name", flags.name, "--mesh", flags.mesh,
           "--material", flags.material, "--hdr", flags.hdr]
    if flags.trans:
        cmd.append("--trans")
    subprocess.run(cmd, check=True)


if __name__ == "__main__":
    main()
