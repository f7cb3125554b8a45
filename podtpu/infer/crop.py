"""Crop annotated objects into class-sorted folders.

Behavioral parity with the reference's crop driver
(`miso/object_detection/crop.py:9-34`): for every annotated image, slice each
box (integer corner coords) out of the full image and save it as
``<stem>_<x>_<y>_<w>_<h><suffix>`` under
``output/<"{task_id} - {task_name}" | relpath | ''>/<label>/`` — the exact
directory and filename scheme downstream tooling expects.
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

import numpy as np
from PIL import Image

from podtpu.data.project import Project
from podtpu.data.imageio import pil_to_rgb

try:
    from tqdm import tqdm
except ImportError:  # pragma: no cover
    def tqdm(x, **_):
        return x


def crop_objects(project: Project, output_dir: str,
                 relative_to: Optional[str] = None) -> int:
    """Returns the number of crops written."""
    os.makedirs(output_dir, exist_ok=True)
    output_path = Path(output_dir)
    written = 0

    for image in tqdm(project.image_dict.values()):
        if not image.boxes:
            continue
        with Image.open(image.full_path) as im:
            arr = pil_to_rgb(im)
        h, w = arr.shape[:2]
        src = Path(image.full_path)
        for box in image.boxes:
            if relative_to is not None:
                label_path = (output_path
                              / src.relative_to(relative_to).parent
                              / box.label)
            elif project.task_names:
                task_name = project.task_names.get(image.dataset_id,
                                                   str(image.dataset_id))
                label_path = (output_path
                              / f"{image.dataset_id} - {task_name}"
                              / box.label)
            else:
                label_path = output_path / box.label
            label_path.mkdir(parents=True, exist_ok=True)

            x1, y1, x2, y2 = box.coords_int
            x1c, y1c = max(x1, 0), max(y1, 0)
            x2c, y2c = min(x2, w), min(y2, h)
            if x2c <= x1c or y2c <= y1c:
                continue
            crop = arr[y1c:y2c, x1c:x2c]
            bx, by, bw, bh = box.bounds
            filename = (f"{src.stem}_{bx:.0f}_{by:.0f}_{bw:.0f}_{bh:.0f}"
                        f"{src.suffix}")
            Image.fromarray(crop).save(label_path / filename)
            written += 1
    return written
