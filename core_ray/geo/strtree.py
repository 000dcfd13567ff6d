"""Sort-Tile-Recursive (STR) bulk-loaded R-tree over item bounding boxes.

From-scratch implementation of the published STR packing algorithm
(Leutenegger, Lopez, Edgington, "STR: A Simple and Efficient Algorithm for
R-Tree Packing", 1997). Used as the per-actor spatial index over the broadcast
admin-polygon table in the pip-join stage — the ST4/J1 analog from SURVEY.md
(scope table shared read-only by all workers, scanner.go:181-186).

Supports batched point queries returning candidate item ids; exact
point-in-polygon runs afterwards on the (small) candidate set.
"""

from __future__ import annotations

import math

import numpy as np


class STRtree:
    """Static R-tree bulk-loaded with STR; leaf/node capacity ``node_capacity``."""

    def __init__(self, bboxes: np.ndarray, node_capacity: int = 8):
        """``bboxes``: (n, 4) float64 [minx, miny, maxx, maxy] per item."""
        bboxes = np.asarray(bboxes, dtype=np.float64).reshape(-1, 4)
        self.n_items = len(bboxes)
        self.cap = node_capacity
        # level 0 = items, each higher level packs the one below
        self.levels: list[np.ndarray] = []        # bbox array per level
        self.children: list[list[np.ndarray]] = []  # per node: child indices into level below
        if self.n_items == 0:
            return
        cur_boxes = bboxes
        cur_ids = np.arange(self.n_items)
        self.levels.append(cur_boxes)
        while len(cur_boxes) > 1:
            groups = self._str_pack(cur_boxes)
            node_boxes = np.empty((len(groups), 4), dtype=np.float64)
            node_children = []
            for gi, idx in enumerate(groups):
                b = cur_boxes[idx]
                node_boxes[gi] = [b[:, 0].min(), b[:, 1].min(), b[:, 2].max(), b[:, 3].max()]
                node_children.append(idx)
            self.levels.append(node_boxes)
            self.children.append(node_children)
            cur_boxes = node_boxes
        _ = cur_ids

    def _str_pack(self, boxes: np.ndarray) -> list[np.ndarray]:
        """One STR packing pass: sort by center-x into vertical slices, then
        by center-y within each slice; chunk into nodes of ``cap``."""
        n = len(boxes)
        cx = (boxes[:, 0] + boxes[:, 2]) * 0.5
        cy = (boxes[:, 1] + boxes[:, 3]) * 0.5
        n_nodes = math.ceil(n / self.cap)
        n_slices = math.ceil(math.sqrt(n_nodes))
        per_slice = n_slices * self.cap
        by_x = np.argsort(cx, kind="stable")
        groups = []
        for s in range(0, n, per_slice):
            sl = by_x[s : s + per_slice]
            sl = sl[np.argsort(cy[sl], kind="stable")]
            for t in range(0, len(sl), self.cap):
                groups.append(sl[t : t + self.cap])
        return groups

    def query_point(self, x: float, y: float) -> np.ndarray:
        """Item indices whose bbox contains (x, y)."""
        if self.n_items == 0:
            return np.empty(0, dtype=np.int64)
        if self.n_items == 1:
            b = self.levels[0][0]
            hit = b[0] <= x <= b[2] and b[1] <= y <= b[3]
            return np.array([0] if hit else [], dtype=np.int64)
        # descend from root
        nodes = [len(self.levels[-1]) - 1] if len(self.levels[-1]) == 1 else None
        frontier = np.arange(len(self.levels[-1]))
        for level in range(len(self.levels) - 1, 0, -1):
            boxes = self.levels[level][frontier]
            hit = (
                (boxes[:, 0] <= x) & (x <= boxes[:, 2])
                & (boxes[:, 1] <= y) & (y <= boxes[:, 3])
            )
            kids = [self.children[level - 1][f] for f in frontier[hit]]
            if not kids:
                return np.empty(0, dtype=np.int64)
            frontier = np.concatenate(kids)
        boxes = self.levels[0][frontier]
        hit = (
            (boxes[:, 0] <= x) & (x <= boxes[:, 2])
            & (boxes[:, 1] <= y) & (y <= boxes[:, 3])
        )
        _ = nodes
        return np.sort(frontier[hit])

    def query_points(self, xs: np.ndarray, ys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Batched query: returns (point_idx, item_idx) candidate pairs.

        Vectorized over points at each tree level: maintains a frontier of
        (point, node) pairs and expands hits level by level.
        """
        xs = np.asarray(xs, dtype=np.float64)
        ys = np.asarray(ys, dtype=np.float64)
        npts = len(xs)
        if self.n_items == 0 or npts == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        top = len(self.levels) - 1
        # frontier: point index + node index at current level
        pt = np.repeat(np.arange(npts), len(self.levels[top]))
        nd = np.tile(np.arange(len(self.levels[top])), npts)
        for level in range(top, 0, -1):
            boxes = self.levels[level][nd]
            hit = (
                (boxes[:, 0] <= xs[pt]) & (xs[pt] <= boxes[:, 2])
                & (boxes[:, 1] <= ys[pt]) & (ys[pt] <= boxes[:, 3])
            )
            pt, nd = pt[hit], nd[hit]
            if len(pt) == 0:
                return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
            kids = self.children[level - 1]
            counts = np.array([len(kids[n]) for n in nd])
            pt = np.repeat(pt, counts)
            nd = np.concatenate([kids[n] for n in nd]) if len(nd) else nd
        boxes = self.levels[0][nd]
        hit = (
            (boxes[:, 0] <= xs[pt]) & (xs[pt] <= boxes[:, 2])
            & (boxes[:, 1] <= ys[pt]) & (ys[pt] <= boxes[:, 3])
        )
        return pt[hit], nd[hit]
