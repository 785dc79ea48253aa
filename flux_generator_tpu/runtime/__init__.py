from .dtypes import DtypePolicy, default_policy
from .prng import RngStream
