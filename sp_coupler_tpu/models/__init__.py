from . import dummy  # noqa: F401
from . import les  # noqa: F401
from . import gcm  # noqa: F401
