from .tlob import tlob_labels  # noqa: F401
from .deeplob import deeplob_labels  # noqa: F401
from .multi_horizon import multi_horizon_labels  # noqa: F401
from .opportunity import opportunity_labels  # noqa: F401
from .magnitude import magnitude_labels  # noqa: F401
from .triple_barrier import triple_barrier_labels  # noqa: F401
from .stats import label_stats  # noqa: F401
