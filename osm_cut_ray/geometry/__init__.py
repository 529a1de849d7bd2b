from .polygon import PolygonIndex, parse_poly_file, parse_poly_text  # noqa: F401
from .geotag import decode_geotag, encode_geotag  # noqa: F401
from . import cells  # noqa: F401
