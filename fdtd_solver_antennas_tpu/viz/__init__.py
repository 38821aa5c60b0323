from .plotting import (
    plot_cross_sections,
    plot_3d_pattern,
    plot_3d_pattern_from_grid,
    draw_patch_3d_geometry,
    draw_patch_top_view,
    draw_microstrip_patch_3d_geometry,
)
from .scene3d import (
    SceneMesh,
    patch_scene_meshes,
    scene_html,
    scene_meshes,
    scene_plotly_figure,
)

__all__ = [
    "plot_cross_sections",
    "plot_3d_pattern",
    "plot_3d_pattern_from_grid",
    "draw_patch_3d_geometry",
    "draw_patch_top_view",
    "draw_microstrip_patch_3d_geometry",
    "SceneMesh",
    "patch_scene_meshes",
    "scene_html",
    "scene_meshes",
    "scene_plotly_figure",
]
