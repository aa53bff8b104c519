"""IO layer: native URDF robot loading (C++), solution persistence."""

from .urdf import load_urdf, load_urdf_string  # noqa: F401
