from . import vxmath
from . import frustum
