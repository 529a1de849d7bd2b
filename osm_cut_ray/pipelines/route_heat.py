"""Road-usage heatmap: GPS traces -> HMM map matching -> exact
on-road positions -> density tiles. The end-to-end composition the
trajectory + raster families exist for (which roads does the fleet
actually use?): every stage is the already-tested primitive, chained
map-side except the matcher's one trajectory shuffle and the tile
renderer's one (tile, pixel) shuffle.
"""

from __future__ import annotations

from ..stages.match import match_trajectories, snapped_positions
from ..stages.snap import (SegmentGrid, TiledSegmentGrid,
                           build_segment_grid_auto)
from ..stages.tiles import render_density_tiles


def route_usage_tiles(points_ds, ways_ds, nodes_ds, *, radius: float,
                      zoom: int, cell_deg: float = 0.5,
                      tile_px: int = 256, k_cands: int = 8,
                      switch_penalty: float | None = None,
                      grid: SegmentGrid | TiledSegmentGrid | None
                      = None):
    """-> (matched, tiles): the match result (for speed profiles /
    QA) and the road-usage density tile Dataset. Off-network fixes
    never reach the heatmap. The grid auto-tiles past the broadcast
    cap (build_segment_grid_auto)."""
    if grid is None:
        grid = build_segment_grid_auto(ways_ds, nodes_ds,
                                       cell_deg=cell_deg)
    matched = match_trajectories(
        points_ds, grid, radius=radius, k_cands=k_cands,
        switch_penalty=switch_penalty).materialize()
    on_road = snapped_positions(matched, grid)
    tiles = render_density_tiles(on_road, zoom=zoom, tile_px=tile_px)
    return matched, tiles
