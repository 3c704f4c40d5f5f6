from .plf_xla import plf_xla
from .plf_pallas import plf_pallas, plf_pallas_lane_major
from . import layout
