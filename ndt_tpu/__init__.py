"""ndt_tpu — a TPU-native hyper-dimensional (N-D) Whitted ray tracer.

A from-scratch JAX/XLA rebuild of the capabilities of
``doing-science-to-stuff/ndt`` (reference: /root/reference, C99 + pthreads +
MPI).  Instead of per-ray recursive C, scenes compile to SoA pytrees of
``[n_obj, D]`` arrays and rendering is a megabatched wavefront over pixel
tiles: ray-object intersection tests are expressed as matmuls
(``[R, D] @ [D, N]`` -> MXU) plus ``[R, N]`` elementwise math (VPU), the
reflection/refraction recursion is flattened into fixed-depth bounce loops,
and pixel tiles shard across a TPU mesh via ``jax.sharding`` (replacing the
reference's pthread row striping and MPI row/pixel/frame modes).

Layer map (mirrors SURVEY.md section 1):
  mathnd        - N-D vector math (vectNd.{h,c} equivalent), host+device
  scene.model   - scene/object/light/camera builder API (scene.h, object.h)
  scene.compile - scene -> SoA device pytree (replaces dlopen plugins)
  scene.yaml_io - YAML scene serde (scene.c WITH_YAML equivalent)
  camera        - camera aiming/ray-gen parameters (camera.{h,c})
  render        - wavefront trace/shade engine (ndt.c:71-1150)
  parallel      - mesh sharding / frame distribution (ndt.c MPI modes)
  image_io      - PNG/JPEG encode, depth maps, async saves (image.{h,c})
  utils         - nelder-mead, kmeans, bounding spheres, kd culling, timing
  scenes        - the reference's workload suite (scenes/*.c equivalents)
"""

__version__ = "0.1.0"

from ndt_tpu.constants import EPSILON

__all__ = ["EPSILON", "__version__"]
