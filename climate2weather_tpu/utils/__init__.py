from climate2weather_tpu.utils.easydict import EasyDict  # noqa: F401
from climate2weather_tpu.utils.registry import (  # noqa: F401
    construct_class_by_name,
    call_func_by_name,
    get_obj_by_name,
)
from climate2weather_tpu.utils.ndata import parse_ndata  # noqa: F401
from climate2weather_tpu.utils.seeding import set_random_seed, derive_seed  # noqa: F401
