"""Dataset/annotation data model and input pipeline.

Reproduces the semantics of the reference's ``miso/object_detection/dataset``
package (Project / ImageMetadata / Label / Rectangle+Polygon annotations, CVAT
REST + XML I/O) and adds a TPU-first fixed-shape input pipeline.
"""
from podtpu.data.label import Label
from podtpu.data.annotation import Annotation, RectangleAnnotation, PolygonAnnotation
from podtpu.data.image import ImageMetadata
from podtpu.data.project import Project

__all__ = [
    "Label",
    "Annotation",
    "RectangleAnnotation",
    "PolygonAnnotation",
    "ImageMetadata",
    "Project",
]
