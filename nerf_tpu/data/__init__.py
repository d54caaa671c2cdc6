"""Data layer: device-resident ray banks and scene datasets."""
from nerf_tpu.data.rays import RayBank
from nerf_tpu.data.scenes import SceneData, load_tiny_nerf, synthesize_scene, spherical_poses
