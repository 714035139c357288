"""Broadcast cell → zone-candidate index.

The Spark-first replacement for the reference's GeoPandas R-tree
(reference: src/osm_chordify/osm/intersect.py:471, :735 — sindex
candidate queries inside sjoin).  Zones are small relative to the fact
side (the reference's county fast-path gate assumes ≤100 polygons,
intersect.py:440-444), so we precompute, driver-side, a flat NumPy index
mapping every covering cell at a fixed resolution to its candidate zone
ids — with a *full* flag for cells entirely inside one zone (the
containment fast path, intersect.py:703-733: such rows skip the exact
geometry test).  The index is broadcast to executors and probed inside
Arrow-batched pandas UDFs: the spatial join becomes a map-side
broadcast lookup with NO shuffle at all.

Scale notes: at 1000 executors the index is shipped once per executor
(torrent broadcast); probe cost is a binary search per point.  Hot
cells (dense urban areas) cost nothing here — skew only matters for
the *output* distribution, which downstream groupBys handle via AQE.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from osm_chordify_spark import cellindex as ci
from osm_chordify_spark import geom as G


def parse_zone_polys(geom_):
    """Coerce WKB bytes / ring-lists / bare rings → [rings, ...] polygons."""
    if isinstance(geom_, (bytes, bytearray)):
        return G.geometry_polygons(bytes(geom_))
    if isinstance(geom_, list) and geom_ and isinstance(geom_[0], list):
        return geom_  # already a multipolygon: [[ring, ...], ...]
    if isinstance(geom_, list) and geom_ and getattr(geom_[0], "ndim", 0) == 2:
        return [geom_]  # one polygon as a rings list
    return [[np.asarray(geom_, dtype=np.float64)]]  # bare ring


def zone_min_res(polys, res: int, world=ci.WORLD, max_cells_per_zone: int = 4096) -> int:
    """Coarsest resolution any of this zone's polygon bboxes needs to keep
    its cover within ``max_cells_per_zone`` (the over-cover guard) —
    shared by the broadcast index and the distributed cell-join path so
    both compute the IDENTICAL effective resolution."""
    eff = res
    for rings in polys:
        x0, y0, x1, y1 = G.polygon_bbox(rings)
        r, _ = ci.pick_cover_res(x0, y0, x1, y1, eff, world, max_cells_per_zone)
        eff = min(eff, r)
    return eff


def zone_cover_cells(polys, res: int, world=ci.WORLD,
                     max_cells_per_zone: int = 4096) -> dict:
    """cell → full flag for ONE zone's polygons at ``res``: bbox cover,
    drop cells whose rect provably misses the polygon, mark cells whose
    rect is entirely inside (the containment fast path).  The single
    source of truth for candidate-cell classification — ZoneIndex.build
    and the distributed path both call this, so their candidate sets are
    byte-identical by construction."""
    seen: dict = {}
    for rings in polys:
        x0, y0, x1, y1 = G.polygon_bbox(rings)
        cover = ci.cover_bbox(x0, y0, x1, y1, res, world, max_cells=max_cells_per_zone)
        bx0, by0, bx1, by1 = ci.cell_bounds(cover, world)
        for k in range(len(cover)):
            full = G.rect_fully_inside(bx0[k], by0[k], bx1[k], by1[k], rings)
            if not full:
                corners_in = G.point_in_polygon(
                    np.array([bx0[k], bx1[k], bx1[k], bx0[k]]),
                    np.array([by0[k], by0[k], by1[k], by1[k]]),
                    rings,
                ).any()
                crossing = any(
                    G.segments_intersect_rect(rg, bx0[k], by0[k], bx1[k], by1[k])
                    for rg in rings
                )
                if not (corners_in or crossing):
                    continue
            c = int(cover[k])
            seen[c] = bool(seen.get(c, False) or full)
    return seen


@dataclass
class ZoneIndex:
    """Flat searchable cell→candidates map (NumPy, pickle-friendly)."""

    res: int
    world: tuple
    # sorted unique covering cells + CSR-style offsets into candidates
    cells: np.ndarray  # int64, sorted
    offsets: np.ndarray  # int64, len(cells)+1
    cand_zone: np.ndarray  # int32 zone ordinal per candidate entry
    cand_full: np.ndarray  # bool per candidate entry
    zone_ids: list  # ordinal → user zone id
    zone_rings: list = field(repr=False)  # ordinal → list[rings]

    @staticmethod
    def build(zones, res: int = 9, world=ci.WORLD, max_cells_per_zone: int = 4096):
        """zones: iterable of (zone_id, rings) where rings is
        [outer, hole, ...] NumPy arrays, or (zone_id, wkb bytes).

        The effective resolution is coarsened until every zone's bbox
        cover fits ``max_cells_per_zone`` (the over-cover guard)."""
        parsed = [(zid, parse_zone_polys(geom_)) for zid, geom_ in zones]

        eff_res = res
        for _zid, polys in parsed:
            eff_res = min(eff_res, zone_min_res(polys, eff_res, world, max_cells_per_zone))

        cell_list, zone_list, full_list = [], [], []
        zone_ids, zone_rings = [], []
        for ordinal, (zid, polys) in enumerate(parsed):
            zone_ids.append(zid)
            zone_rings.append(polys)
            seen = zone_cover_cells(polys, eff_res, world, max_cells_per_zone)
            for c, full in seen.items():
                cell_list.append(c)
                zone_list.append(ordinal)
                full_list.append(full)

        cell_arr = np.asarray(cell_list, dtype=np.int64)
        order = np.argsort(cell_arr, kind="stable")
        cell_arr = cell_arr[order]
        zone_arr = np.asarray(zone_list, dtype=np.int32)[order]
        full_arr = np.asarray(full_list, dtype=bool)[order]
        uniq, start = np.unique(cell_arr, return_index=True)
        offsets = np.append(start, len(cell_arr)).astype(np.int64)
        return ZoneIndex(
            res=eff_res,
            world=world,
            cells=uniq,
            offsets=offsets,
            cand_zone=zone_arr,
            cand_full=full_arr,
            zone_ids=zone_ids,
            zone_rings=zone_rings,
        )

    # -- probes ------------------------------------------------------------

    def candidates_for_points(self, x: np.ndarray, y: np.ndarray):
        """Fully vectorized: point arrays → (point_idx, zone_ordinal,
        needs_exact) candidate triples as flat arrays (no Python loop —
        CSR range expansion via the repeat/cumsum trick)."""
        pc = ci.cell_at(x, y, self.res, self.world)
        if len(self.cells) == 0:
            empty = np.empty(0, dtype=np.int64)
            return empty, empty.astype(np.int32), empty.astype(bool)
        pos = np.clip(np.searchsorted(self.cells, pc), 0, len(self.cells) - 1)
        valid = self.cells[pos] == pc
        idx = np.nonzero(valid)[0]
        starts = self.offsets[pos[idx]]
        counts = self.offsets[pos[idx] + 1] - starts
        total = int(counts.sum())
        if total == 0:
            empty = np.empty(0, dtype=np.int64)
            return empty, empty.astype(np.int32), empty.astype(bool)
        pts = np.repeat(idx, counts)
        offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
        flat = np.arange(total, dtype=np.int64) + np.repeat(starts - offs, counts)
        return pts, self.cand_zone[flat], ~self.cand_full[flat]

    def assign_points(self, x: np.ndarray, y: np.ndarray):
        """Point-in-polygon assignment (possibly multiple zones per point).

        Returns (point_idx, zone_ordinal) pairs after exact winding-number
        refinement of partial cells.  Fully-inside cells skip the exact
        test (the reference's proportion=1.0 fast path, intersect.py:703-733)."""
        pts, zones, needs = self.candidates_for_points(x, y)
        if len(pts) == 0:
            return pts, zones
        keep = np.ones(len(pts), dtype=bool)
        exact_idx = np.nonzero(needs)[0]
        # group exact tests by zone ordinal → one vectorized PIP per zone
        for z in np.unique(zones[exact_idx]):
            sel = exact_idx[zones[exact_idx] == z]
            px, py = x[pts[sel]], y[pts[sel]]
            inside = np.zeros(len(sel), dtype=bool)
            for rings in self.zone_rings[z]:
                inside |= G.point_in_polygon(px, py, rings)
            keep[sel] = inside
        return pts[keep], zones[keep]

    def candidates_for_cells(self, cells: np.ndarray):
        """cells (already at self.res) → (cell_pos_idx, zone_ordinal, full)
        — same vectorized CSR expansion as candidates_for_points."""
        if len(self.cells) == 0 or len(cells) == 0:
            empty = np.empty(0, dtype=np.int64)
            return empty, empty.astype(np.int32), empty.astype(bool)
        pos = np.clip(np.searchsorted(self.cells, cells), 0, len(self.cells) - 1)
        valid = self.cells[pos] == cells
        idx = np.nonzero(valid)[0]
        starts = self.offsets[pos[idx]]
        counts = self.offsets[pos[idx] + 1] - starts
        total = int(counts.sum())
        if total == 0:
            empty = np.empty(0, dtype=np.int64)
            return empty, empty.astype(np.int32), empty.astype(bool)
        out_i = np.repeat(idx, counts)
        offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
        flat = np.arange(total, dtype=np.int64) + np.repeat(starts - offs, counts)
        return out_i, self.cand_zone[flat], self.cand_full[flat]


    def assign_points_nearest(self, x: np.ndarray, y: np.ndarray,
                              max_ring: int = 64):
        """PIP assignment with nearest-zone fallback: every point gets
        exactly one zone — its containing zone (ties → smallest
        ordinal), else the zone with the minimum exact distance to its
        boundary (point-to-segment over the zone rings).

        Returns (zone_ordinal int32 array aligned with x, dist float64
        array; dist is 0 for contained points).  Ordinal is -1 for
        non-finite coordinates and for points with no zone within
        ``max_ring`` index cells (callers wanting a hard every-point
        guarantee should size max_ring to their domain — the default
        covers 64 cells ≈ half the world at res 7).  The candidate
        search expands cell-ring SHELLS over the covering-cell index;
        the ring-r stop bound holds because any zone with no cover cell
        inside ring r has its whole boundary ≥ (r-1)·cell_min away, and
        the loop exits early once every zone has been scored."""
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        out_zone = np.full(len(x), -1, dtype=np.int32)
        out_dist = np.zeros(len(x), dtype=np.float64)
        finite = np.isfinite(x) & np.isfinite(y)
        pts, zs = self.assign_points(
            np.where(finite, x, 0.0), np.where(finite, y, 0.0)
        )
        if len(pts):
            keep = finite[pts]
            pts, zs = pts[keep], zs[keep]
        if len(pts):
            # smallest ordinal wins for points in multiple zones
            order = np.argsort(zs, kind="stable")[::-1]
            out_zone[pts[order]] = zs[order]
        todo = np.nonzero((out_zone < 0) & finite)[0]
        if len(todo) == 0:
            return out_zone, out_dist

        x0, y0, x1, y1 = self.world
        n = 1 << self.res
        cell_min = min((x1 - x0) / n, (y1 - y0) / n)

        def zone_dist(px, py, ordinal):
            best = np.inf
            for rings in self.zone_rings[ordinal]:
                for ring in rings:
                    r = G.ring_close(ring)
                    d = G.point_segment_dist(
                        px, py, r[:-1, 0], r[:-1, 1], r[1:, 0], r[1:, 1]
                    )
                    best = min(best, float(np.min(d)))
            return best

        n_zones = len(self.zone_ids)
        for i in todo:
            pc = ci.cell_at(x[i], y[i], self.res, self.world)
            seen: set = set()
            best_z, best_d = -1, np.inf
            for r in range(0, max_ring + 1):
                # incremental shell, not the full disk re-probed per round
                cells = ci.ring_only(pc, r)
                _pos, zcand, _full = self.candidates_for_cells(
                    np.unique(cells)
                )
                fresh = [z for z in np.unique(zcand) if z not in seen]
                for z in fresh:
                    seen.add(int(z))
                    d = zone_dist(x[i], y[i], int(z))
                    if d < best_d or (d == best_d and z < best_z):
                        best_z, best_d = int(z), d
                if len(seen) == n_zones:
                    break  # every zone scored exactly — nothing left
                # stop once no unseen zone can beat the best: zones with
                # no cover cell within ring r are >= (r-1)*cell_min away
                if best_z >= 0 and best_d <= max(r - 1, 0) * cell_min:
                    break
            out_zone[i] = best_z
            out_dist[i] = best_d if np.isfinite(best_d) else 0.0
        return out_zone, out_dist
