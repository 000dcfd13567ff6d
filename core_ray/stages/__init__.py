"""Ray Data stages of the spatial pipeline.

Each stage is either a plain function (stateless tasks) or a callable class
(actor pool; expensive state built once per actor in __init__ — the ST1/ST4
pattern from SURVEY.md §2.4). Stages register themselves in
``core_ray.config.STAGE_REGISTRY`` for the plugin-style "register + select
subset" ergonomics of the reference (pkg/parser/framework/registry.go:12-66).
"""

from core_ray.stages.extract import ExtractText  # noqa: F401
from core_ray.stages.geocode import Geocoder  # noqa: F401
from core_ray.stages.cellencode import CellEncoder  # noqa: F401
from core_ray.stages.pip import PipJoin  # noqa: F401
from core_ray.stages.analyzer import PageAnalyzer  # noqa: F401
