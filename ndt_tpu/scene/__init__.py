from ndt_tpu.scene.model import (  # noqa: F401
    Light,
    LightType,
    Object,
    Scene,
    object_types,
    register_object_type,
)
from ndt_tpu.scene.compile import SceneData, compile_scene  # noqa: F401
