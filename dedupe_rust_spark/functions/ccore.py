"""Union-find transitive closure — the pure-Python oracle for the
distributed connected-components operator (operators/cluster.py).

The reference never needs this: its matching is hash-equality, which is
transitive, so groups ARE clusters (/root/reference/src/main.rs:616-624).
Fuzzy matching breaks transitivity, hence CC over match edges.
"""

from __future__ import annotations


class UnionFind:
    def __init__(self) -> None:
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        root = x
        while self.parent.setdefault(root, root) != root:
            root = self.parent[root]
        while self.parent[x] != root:  # path compression
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller label wins (cluster_id = min member)
            if rb < ra:
                ra, rb = rb, ra
            self.parent[rb] = ra


def connected_components(edges: list[tuple[str, str]]) -> dict[str, str]:
    """node -> min-member cluster label, via union-find."""
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    return {n: uf.find(n) for n in list(uf.parent)}
