"""Procedural Blender render scene for generated gesture clips.

The reference ships an opaque binary scene (`blender/poseRender.blend` +
`wood2.jpg`) used for the paper's high-quality figures; the scene itself is
not reproducible from source. This script replaces it with a fully
procedural equivalent: run under Blender's bundled Python it builds the
whole scene — stick-figure skeleton (spheres at the 10 TED upper-body
joints, cylinders along the 9 bones of `constants.DIR_VEC_PAIRS`,
ref utils/ted_db_utils.py:14-15), ground plane, three-point lighting,
camera — keyframes the skeleton from a generation pickle
(`render/video.py::save_generation_pkl`, the same dumps the reference
writes at processor_v2.py:1418-1437), attaches the clip audio, and renders
an mp4 or PNG sequence.

Usage (Blender 2.9+ / 3.x / 4.x):

    blender --background --python blender/pose_render.py -- \
        --pkl render/clip_s2ag.pkl --out /tmp/clip.mp4 \
        [--which out_poses|human] [--fps 15] [--samples 32]

Everything geometric (bone placement math, scene layout constants) lives in
bpy-free functions so the math is unit-tested in this repo's CI
(tests/test_blender_scene.py) without Blender installed; only the thin
`build_scene`/`render` layer touches bpy.
"""

from __future__ import annotations

import argparse
import math
import os
import pickle
import sys

import numpy as np

# TED upper-body topology (constants.py mirrors ref utils/ted_db_utils.py:14-15);
# duplicated literally here so the script is standalone inside Blender's
# bundled Python, where the package may not be importable
DIR_VEC_PAIRS = (
    (0, 1, 0.26), (1, 2, 0.18), (2, 3, 0.14),
    (1, 4, 0.22), (4, 5, 0.36), (5, 6, 0.33),
    (1, 7, 0.22), (7, 8, 0.36), (8, 9, 0.33),
)
NUM_JOINTS = 10

JOINT_RADIUS = 0.028
BONE_RADIUS = 0.018
# scene layout: skeleton stands at origin, +Y is "up" in the data (the
# matplotlib renderer plots (x, z, -y); here we map data (x, y, z) ->
# blender (x, z, -y) so the figure is upright in Blender's Z-up world)
CAMERA_LOCATION = (0.0, -2.2, 0.35)
CAMERA_ROT_EULER = (math.radians(80.0), 0.0, 0.0)
LIGHTS = (
    # (name, type, location, energy)
    ("key", "AREA", (1.5, -1.5, 2.0), 300.0),
    ("fill", "AREA", (-1.8, -1.0, 1.2), 120.0),
    ("rim", "AREA", (0.0, 2.0, 2.2), 180.0),
)


# --------------------------------------------------------------------------
# bpy-free math (unit-tested without Blender)
# --------------------------------------------------------------------------

def data_to_world(p: np.ndarray) -> np.ndarray:
    """Map data-space joints (F?, J, 3) to Blender world space: the pose
    stream's y axis points "up the body" and z toward the camera (see the
    matplotlib plot transform, render/video.py); Blender is Z-up."""
    p = np.asarray(p, np.float32)
    out = np.empty_like(p)
    out[..., 0] = p[..., 0]
    out[..., 1] = -p[..., 2]
    out[..., 2] = p[..., 1]
    return out


def bone_transform(a: np.ndarray, b: np.ndarray):
    """Cylinder placement for a bone from joint `a` to joint `b`:
    (center, length, quaternion wxyz rotating +Z onto the bone axis).

    The quaternion is the minimal rotation taking u=(0,0,1) to
    d=(b-a)/|b-a|: q = [cos(t/2), sin(t/2)*axis], axis = u x d normalized.
    Degenerate cases: d ~ +Z -> identity; d ~ -Z -> pi about X.
    """
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    v = b - a
    length = float(np.linalg.norm(v))
    center = (a + b) / 2.0
    if length < 1e-9:
        return center, 0.0, np.array([1.0, 0.0, 0.0, 0.0])
    d = v / length
    # u = +Z; cross/dot against d
    cx, cy, cz = -d[1], d[0], 0.0  # u x d
    dot = d[2]
    s2 = cx * cx + cy * cy
    if s2 < 1e-18:
        if dot > 0.0:
            return center, length, np.array([1.0, 0.0, 0.0, 0.0])
        return center, length, np.array([0.0, 1.0, 0.0, 0.0])
    # half-angle form: q = normalize([1 + dot, u x d])
    q = np.array([1.0 + dot, cx, cy, cz])
    q /= np.linalg.norm(q)
    return center, length, q


def frame_transforms(joints: np.ndarray):
    """Per-frame object transforms for every joint sphere and bone cylinder.

    joints: (J, 3) world-space. Returns (joint_locs (J,3),
    bone_centers (B,3), bone_lengths (B,), bone_quats (B,4) wxyz)."""
    joints = np.asarray(joints, np.float64)
    centers = np.empty((len(DIR_VEC_PAIRS), 3))
    lengths = np.empty(len(DIR_VEC_PAIRS))
    quats = np.empty((len(DIR_VEC_PAIRS), 4))
    for i, (pa, ch, _ref_len) in enumerate(DIR_VEC_PAIRS):
        c, l, q = bone_transform(joints[pa], joints[ch])
        centers[i], lengths[i], quats[i] = c, l, q
    return joints, centers, lengths, quats


def load_clip(pkl_path: str, which: str = "out_poses") -> dict:
    """Read a save_generation_pkl dump -> {poses (F,J,3) world space,
    audio (S,) f32 16 kHz, sentence}. which: out_poses | human (human
    reconstructs FK from human_dir_vec via cumulative bone sums)."""
    with open(pkl_path, "rb") as f:
        d = pickle.load(f)
    if which == "out_poses":
        poses = np.asarray(d["out_poses"], np.float32)
    elif which == "human":
        vec = np.asarray(d["human_dir_vec"], np.float32).reshape(-1, 9, 3)
        poses = np.zeros((len(vec), NUM_JOINTS, 3), np.float32)
        for i, (pa, ch, _l) in enumerate(DIR_VEC_PAIRS):
            poses[:, ch] = poses[:, pa] + vec[:, i]
    else:
        raise ValueError(f"which={which!r} (out_poses|human)")
    return {
        "poses": data_to_world(poses),
        "audio": np.asarray(d.get("audio", np.zeros(0)), np.float32),
        "sentence": d.get("sentence", ""),
    }


# --------------------------------------------------------------------------
# bpy layer (only runs inside Blender)
# --------------------------------------------------------------------------

def build_scene(poses: np.ndarray, fps: int = 15, samples: int = 32):
    import bpy

    bpy.ops.wm.read_factory_settings(use_empty=True)
    scene = bpy.context.scene
    scene.render.fps = fps
    scene.frame_start = 1
    scene.frame_end = len(poses)
    scene.render.engine = (
        "BLENDER_EEVEE_NEXT" if hasattr(bpy.types, "RenderSettings")
        and "BLENDER_EEVEE_NEXT" in
        bpy.types.RenderSettings.bl_rna.properties["engine"].enum_items
        else "BLENDER_EEVEE"
    )
    if hasattr(scene, "eevee"):
        scene.eevee.taa_render_samples = samples

    # materials
    def matte(name, rgba):
        m = bpy.data.materials.new(name)
        m.use_nodes = True
        m.node_tree.nodes["Principled BSDF"].inputs[
            "Base Color"].default_value = rgba
        return m

    skel_mat = matte("skeleton", (0.85, 0.45, 0.12, 1.0))
    floor_mat = matte("floor", (0.35, 0.25, 0.16, 1.0))  # wood-toned stand-in
    # if the reference's wood texture sits next to this script, use it
    wood = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "wood2.jpg")
    if os.path.exists(wood):
        tree = floor_mat.node_tree
        tex = tree.nodes.new("ShaderNodeTexImage")
        tex.image = bpy.data.images.load(wood)
        tree.links.new(tex.outputs["Color"],
                       tree.nodes["Principled BSDF"].inputs["Base Color"])

    # floor
    floor_z = float(poses[..., 2].min()) - 0.05
    bpy.ops.mesh.primitive_plane_add(size=8.0, location=(0, 0, floor_z))
    bpy.context.object.data.materials.append(floor_mat)

    # lights
    for name, ltype, loc, energy in LIGHTS:
        light = bpy.data.lights.new(name, ltype)
        light.energy = energy
        obj = bpy.data.objects.new(name, light)
        obj.location = loc
        scene.collection.objects.link(obj)

    # camera
    cam = bpy.data.cameras.new("cam")
    cam_obj = bpy.data.objects.new("cam", cam)
    cam_obj.location = CAMERA_LOCATION
    cam_obj.rotation_euler = CAMERA_ROT_EULER
    scene.collection.objects.link(cam_obj)
    scene.camera = cam_obj

    # skeleton objects
    joints = []
    for j in range(NUM_JOINTS):
        bpy.ops.mesh.primitive_uv_sphere_add(radius=JOINT_RADIUS)
        ob = bpy.context.object
        ob.name = f"joint_{j}"
        ob.data.materials.append(skel_mat)
        joints.append(ob)
    bones = []
    for i in range(len(DIR_VEC_PAIRS)):
        bpy.ops.mesh.primitive_cylinder_add(radius=BONE_RADIUS, depth=1.0)
        ob = bpy.context.object
        ob.name = f"bone_{i}"
        ob.rotation_mode = "QUATERNION"
        ob.data.materials.append(skel_mat)
        bones.append(ob)

    # keyframes
    for f, frame_pose in enumerate(poses, start=1):
        locs, centers, lengths, quats = frame_transforms(frame_pose)
        for j, ob in enumerate(joints):
            ob.location = locs[j]
            ob.keyframe_insert("location", frame=f)
        for i, ob in enumerate(bones):
            ob.location = centers[i]
            ob.scale = (1.0, 1.0, max(lengths[i], 1e-6))
            ob.rotation_quaternion = quats[i]
            ob.keyframe_insert("location", frame=f)
            ob.keyframe_insert("scale", frame=f)
            ob.keyframe_insert("rotation_quaternion", frame=f)
    return scene


def render(scene, out_path: str, audio: np.ndarray | None = None,
           sr: int = 16000):
    import bpy

    scene.render.filepath = out_path
    if out_path.endswith(".mp4"):
        scene.render.image_settings.file_format = "FFMPEG"
        scene.render.ffmpeg.format = "MPEG4"
        scene.render.ffmpeg.codec = "H264"
        if audio is not None and len(audio):
            wav = out_path + ".wav"
            _write_wav(wav, audio, sr)
            if not scene.sequence_editor:
                scene.sequence_editor_create()
            scene.sequence_editor.sequences.new_sound(
                "clip_audio", wav, channel=1, frame_start=1)
            scene.render.ffmpeg.audio_codec = "AAC"
    else:
        scene.render.image_settings.file_format = "PNG"
    bpy.ops.render.render(animation=True)


def _write_wav(path: str, audio: np.ndarray, sr: int):
    import struct
    import wave

    pcm = np.clip(np.asarray(audio, np.float32), -1, 1)
    pcm16 = (pcm * 32767).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm16.tobytes())
    return struct  # keep linters quiet about the unused import pattern


def main(argv):
    p = argparse.ArgumentParser()
    p.add_argument("--pkl", required=True)
    p.add_argument("--out", required=True, help=".mp4 or a PNG path pattern")
    p.add_argument("--which", default="out_poses",
                   choices=["out_poses", "human"])
    p.add_argument("--fps", type=int, default=15)
    p.add_argument("--samples", type=int, default=32)
    args = p.parse_args(argv)

    clip = load_clip(args.pkl, args.which)
    scene = build_scene(clip["poses"], fps=args.fps, samples=args.samples)
    render(scene, args.out, clip["audio"])


if __name__ == "__main__":
    # under `blender --python script -- ARGS`, our args follow the `--`
    argv = sys.argv[sys.argv.index("--") + 1:] if "--" in sys.argv else sys.argv[1:]
    main(argv)
