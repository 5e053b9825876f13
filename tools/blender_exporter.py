#!/usr/bin/env python3
"""Blender -> scene.json exporter (the counterpart of the reference's
Blend/exporter.py, reimplemented — not copied — against the same JSON
schema so .blend assets flow into ray_tracying_tpu).

Run headless:  blender --background scene.blend --python blender_exporter.py
Output:        scene.json next to the .blend (or $RTT_EXPORT_PATH)

Schema produced (matches scene/loader.py = reference json_loader.cpp):
  cameras[0]: location, gaze_vector, up_vector, focal_length,
              sensor_width/height, aperture, focus_dist
  render:     resolution_x/y
  lights:     location, color, intensity, radius
  spheres:    location, rotation, scale, velocity, material
  cubes:      translation, rotation, scale, material
  rectangles: translation, rotation, scale, material
  planes:     corners[4], material

Object classification follows the reference's name-based convention
(reference Blend/exporter.py:186-245): object names containing "Sphere"
export as spheres, "Cube" as cubes, "Plane" as rectangles.

Material extraction handles Principled BSDF (base color, roughness,
metallic -> reflectivity, transmission -> transparency, IOR) and Glass
BSDF, with image-texture filename passthrough.
"""

import json
import math
import os

try:
    import bpy  # type: ignore
except ImportError:  # pragma: no cover - only runs inside Blender
    bpy = None


def _vec(v):
    return [float(v[0]), float(v[1]), float(v[2])]


def _find_image_texture(node, depth=0):
    """Recursive image-texture search through node inputs (handles Mix /
    Bump chains)."""
    if node is None or depth > 6:
        return ""
    if node.type == "TEX_IMAGE" and node.image:
        return os.path.basename(node.image.filepath or node.image.name)
    for inp in getattr(node, "inputs", []):
        for link in inp.links:
            found = _find_image_texture(link.from_node, depth + 1)
            if found:
                return found
    return ""


def _material_json(obj):
    mat = {
        "diffuse_color": [0.8, 0.8, 0.8],
        "specular_color": [1.0, 1.0, 1.0],
        "roughness": 0.5,
        "k_ambient": 0.1,
        "k_diffuse": 0.6,
        "k_specular": 0.4,
        "reflectivity": 0.0,
        "transparency": 0.0,
        "refractive_index": 1.0,
    }
    if not obj.data.materials or not obj.data.materials[0]:
        return mat
    m = obj.data.materials[0]
    if not m.use_nodes:
        mat["diffuse_color"] = _vec(m.diffuse_color[:3])
        return mat
    for node in m.node_tree.nodes:
        if node.type == "BSDF_PRINCIPLED":
            mat["diffuse_color"] = _vec(node.inputs["Base Color"].default_value[:3])
            mat["roughness"] = float(node.inputs["Roughness"].default_value)
            mat["reflectivity"] = float(node.inputs["Metallic"].default_value)
            for key in ("Transmission Weight", "Transmission"):
                if key in node.inputs:
                    mat["transparency"] = float(node.inputs[key].default_value)
                    break
            if "IOR" in node.inputs:
                mat["refractive_index"] = float(node.inputs["IOR"].default_value)
            tex = _find_image_texture(node)
            if tex:
                mat["texture_file"] = tex
            break
        if node.type == "BSDF_GLASS":
            mat["transparency"] = 0.9
            mat["refractive_index"] = float(node.inputs["IOR"].default_value)
            mat["roughness"] = float(node.inputs["Roughness"].default_value)
            break
    return mat


def export_scene(out_path=None):
    assert bpy is not None, "run inside Blender: blender --background --python ..."
    scene = bpy.context.scene
    data = {"cameras": [], "lights": [], "spheres": [], "cubes": [],
            "rectangles": [], "planes": []}

    for obj in bpy.data.objects:
        if obj.type == "CAMERA":
            from mathutils import Vector

            cam = obj.data
            quat = obj.matrix_world.to_quaternion()
            # Blender cameras look down -Z with +Y up in local space.
            gaze = quat @ Vector((0.0, 0.0, -1.0))
            up = quat @ Vector((0.0, 1.0, 0.0))
            data["cameras"].append({
                "location": _vec(obj.matrix_world.translation),
                "gaze_vector": _vec(gaze),
                "up_vector": _vec(up),
                "focal_length": float(cam.lens),
                "sensor_width": float(cam.sensor_width),
                "sensor_height": float(cam.sensor_height),
                "aperture": float(getattr(cam.dof, "aperture_fstop", 0.0))
                if getattr(cam.dof, "use_dof", False) else 0.0,
                "focus_dist": float(getattr(cam.dof, "focus_distance", 10.0)),
            })
        elif obj.type == "LIGHT":
            li = obj.data
            data["lights"].append({
                "location": _vec(obj.matrix_world.translation),
                "color": _vec(li.color),
                "intensity": float(li.energy),
                "radius": float(getattr(li, "shadow_soft_size", 0.0)),
            })
        elif obj.type == "MESH":
            name = obj.name
            loc = _vec(obj.matrix_world.translation)
            rot = [float(a) for a in obj.rotation_euler]
            dims = obj.dimensions
            if "Sphere" in name:
                entry = {
                    "location": loc,
                    "rotation": rot,
                    "scale": [dims[0] / 2, dims[1] / 2, dims[2] / 2],
                    "material": _material_json(obj),
                }
                # Animated objects export a per-frame velocity.
                if obj.animation_data and obj.animation_data.action:
                    f0 = scene.frame_current
                    scene.frame_set(f0)
                    p0 = obj.matrix_world.translation.copy()
                    scene.frame_set(f0 + 1)
                    p1 = obj.matrix_world.translation.copy()
                    scene.frame_set(f0)
                    entry["velocity"] = _vec(p1 - p0)
                data["spheres"].append(entry)
            elif "Cube" in name:
                data["cubes"].append({
                    "translation": loc,
                    "rotation": rot,
                    "scale": [float(s) for s in obj.scale],
                    "material": _material_json(obj),
                })
            elif "Plane" in name:
                data["rectangles"].append({
                    "translation": loc,
                    "rotation": rot,
                    "scale": [float(s) * 2 for s in obj.scale[:2]] + [1.0],
                    "material": _material_json(obj),
                })

    data["render"] = {
        "resolution_x": int(scene.render.resolution_x),
        "resolution_y": int(scene.render.resolution_y),
    }

    if out_path is None:
        out_path = os.environ.get("RTT_EXPORT_PATH")
    if out_path is None:
        base = bpy.data.filepath or "scene.blend"
        out_path = os.path.join(os.path.dirname(base), "scene.json")
    with open(out_path, "w") as f:
        json.dump(data, f, indent=1)
    print(f"exported {out_path}")


if __name__ == "__main__":
    export_scene()
