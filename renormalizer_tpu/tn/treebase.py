"""Tree containers and basis-tree topology factories.

Reference ``renormalizer/tn/treebase.py``: linear (== MPS), binary,
MCTDH-style (physical DoFs on leaves, dummy interior nodes) and T3NS
topologies, plus the P/Q thermofield doubling helper.
"""

from itertools import chain
from typing import Any, Dict, List, Sequence

import numpy as np

from renormalizer_tpu.model import Op
from renormalizer_tpu.model.basis import BasisDummy, BasisSet
from renormalizer_tpu.tn.node import (
    NodeUnion,
    TreeNodeBasis,
    TreeNodeText,
    build_connection_adj_mat,
    copy_connection,
)


class Tree:
    def __init__(self, root: NodeUnion):
        assert root.parent is None
        self.root = root
        self.node_list = self.preorder_list()
        self.node_idx: Dict[NodeUnion, int] = {n: i for i, n in enumerate(self.node_list)}

    def preorder_list(self, func=None) -> List[NodeUnion]:
        def recursion(node):
            ret = [node if func is None else func(node)]
            for child in node.children:
                ret += recursion(child)
            return ret

        return recursion(self.root)

    def postorder_list(self) -> List[NodeUnion]:
        def recursion(node):
            ret = []
            for child in node.children:
                ret += recursion(child)
            ret.append(node)
            return ret

        return recursion(self.root)

    @staticmethod
    def find_path(node1: NodeUnion, node2: NodeUnion) -> List[NodeUnion]:
        """Path between two nodes through their lowest common ancestor."""
        assert node1 != node2
        ancestors1 = node1.ancestors
        ancestors2 = node2.ancestors
        set2 = set(ancestors2)
        common = next(a for a in ancestors1 if a in set2)
        path1 = ancestors1[: ancestors1.index(common) + 1]
        path2 = ancestors2[: ancestors2.index(common)]
        return path1 + path2[::-1]

    @property
    def adj_matrix(self) -> np.ndarray:
        mat = np.zeros((len(self.node_list),) * 2, dtype=np.uint8)
        for i, node in enumerate(self.node_list):
            for child in node.children:
                mat[i, self.node_idx[child]] = 1
        return mat

    @property
    def size(self):
        return len(self.node_list)

    def __len__(self):
        return self.size

    def __iter__(self):
        return iter(self.node_list)

    def __repr__(self):
        return f"{self.__class__} with {len(self)} nodes"


def approximate_partition(sequence, ngroups):
    size = (len(sequence) - 1) // ngroups + 1
    return [
        sequence[i * size: min((i + 1) * size, len(sequence))] for i in range(ngroups)
    ]


class BasisTree(Tree):
    """Tree of :class:`TreeNodeBasis` (reference ``treebase.py:85-423``)."""

    # --- topology factories -------------------------------------------------
    @classmethod
    def linear(cls, basis_list: List[BasisSet]) -> "BasisTree":
        """Linear chain, equivalent to an MPS."""
        nodes = [TreeNodeBasis([b]) for b in basis_list]
        for i in range(len(nodes) - 1):
            nodes[i].add_child(nodes[i + 1])
        return cls(nodes[0])

    @classmethod
    def binary(cls, basis_list: List[BasisSet]) -> "BasisTree":
        """Binary tree with physical DoFs on every node."""
        nodes = [TreeNodeBasis([b]) for b in basis_list]

        def recursion(node, offspring):
            if not offspring:
                return
            node.add_child(offspring[0])
            if len(offspring) == 1:
                return
            node.add_child(offspring[1])
            rest = offspring[2:]
            mid = len(rest) // 2
            recursion(offspring[0], rest[:mid])
            recursion(offspring[1], rest[mid:])

        recursion(nodes[0], nodes[1:])
        return cls(nodes[0])

    @classmethod
    def general_mctdh(
        cls,
        basis_list: List[BasisSet],
        tree_order: int,
        contract_primitive: bool = False,
        contract_label: Sequence[bool] = None,
        dummy_label="MCTDH virtual",
    ) -> "BasisTree":
        """MCTDH-style tree: physical DoFs only on leaves, dummy interior
        nodes (reference ``treebase.py:142-246``)."""
        assert len(basis_list) > 1

        elementary: List[TreeNodeBasis] = []
        if not contract_primitive:
            assert contract_label is None, (
                "providing label makes sense only when primitives are contracted"
            )
            while tree_order < len(basis_list):
                elementary.append(TreeNodeBasis(basis_list[:tree_order]))
                basis_list = basis_list[tree_order:]
            elementary.append(TreeNodeBasis(basis_list))
        else:
            if contract_label is None:
                elementary = [TreeNodeBasis([b]) for b in basis_list]
            else:
                assert len(contract_label) == len(basis_list)
                i = 0
                while i != len(basis_list):
                    if contract_label[i]:
                        elementary.append(TreeNodeBasis([basis_list[i]]))
                        i += 1
                    else:
                        for j in range(1, tree_order + 1):
                            if i + j == len(contract_label) or contract_label[i + j]:
                                break
                        elementary.append(TreeNodeBasis(basis_list[i: i + j]))
                        i += j

        counter = [0]

        def recursion(nodes_: List[TreeNodeBasis]) -> TreeNodeBasis:
            node = TreeNodeBasis([BasisDummy((dummy_label, counter[0]))])
            counter[0] += 1
            if len(nodes_) <= tree_order:
                node.add_child(nodes_)
                return node
            for group in approximate_partition(nodes_, tree_order):
                node.add_child(recursion(group))
            return node

        return cls(recursion(elementary))

    @classmethod
    def binary_mctdh(cls, basis_list, contract_primitive=False, contract_label=None,
                     dummy_label="MCTDH virtual"):
        return cls.general_mctdh(basis_list, 2, contract_primitive, contract_label, dummy_label)

    @classmethod
    def ternary_mctdh(cls, basis_list, contract_primitive=False, contract_label=None,
                      dummy_label="MCTDH virtual"):
        return cls.general_mctdh(basis_list, 3, contract_primitive, contract_label, dummy_label)

    @classmethod
    def t3ns(cls, basis_list: List[BasisSet], t3ns_label="T3NS virtual") -> "BasisTree":
        """T3NS topology (reference ``treebase.py:279-306``)."""
        counter = [0]

        def recursion(parent, basis_list_):
            if len(basis_list_) == 0:
                return
            if len(basis_list_) == 1:
                parent.add_child(TreeNodeBasis(basis_list_))
                return
            if len(basis_list_) == 2:
                node1 = TreeNodeBasis(basis_list_[:1])
                parent.add_child(node1)
                node1.add_child(TreeNodeBasis(basis_list_[1:]))
                return
            node1 = TreeNodeBasis(basis_list_[:1])
            parent.add_child(node1)
            node2 = TreeNodeBasis([BasisDummy((t3ns_label, counter[0]))])
            counter[0] += 1
            node1.add_child(node2)
            for part in approximate_partition(basis_list_[1:], 2):
                recursion(node2, part)

        root = TreeNodeBasis([BasisDummy((t3ns_label, counter[0]))])
        counter[0] += 1
        for partition in approximate_partition(basis_list, 3):
            recursion(root, partition)
        return cls(root)

    # --- construction --------------------------------------------------------
    def __init__(self, root: TreeNodeBasis):
        super().__init__(root)
        for node in self.node_list:
            assert isinstance(node, TreeNodeBasis)
        qn_sizes = {n.qn_size for n in self.node_list}
        if len(qn_sizes) != 1:
            raise ValueError(f"Inconsistent quantum number size: {qn_sizes}")
        self.qn_size: int = qn_sizes.pop()

        self.basis2idx: Dict[BasisSet, int] = {}
        self.dof2idx: Dict[Any, int] = {}
        self.dof2basis: Dict[Any, BasisSet] = {}
        for i, node in enumerate(self.node_list):
            for b in node.basis_sets:
                self.basis2idx[b] = i
                for d in b.dofs:
                    self.dof2idx[d] = i
                    self.dof2basis[d] = b

        self.identity_op: Op = Op("I", self.root.dofs[0][0])
        # cached identity / dummy TTNOs (built lazily by ``tn.tree``)
        self.identity_ttno = None
        self.dummy_ttno = None

    def print(self, print_function=print):
        """ASCII rendering of the tree."""
        def recursion(node, prefix, is_last):
            text = str([b.dofs for b in node.basis_sets])
            if node.bond_dim is not None:
                text += f" {node.bond_dim}"
            connector = "└── " if is_last else "├── "
            if node.parent is None:
                print_function(text)
                child_prefix = ""
            else:
                print_function(prefix + connector + text)
                child_prefix = prefix + ("    " if is_last else "│   ")
            for i, child in enumerate(node.children):
                recursion(child, child_prefix, i == len(node.children) - 1)

        recursion(self.root, "", True)

    @property
    def basis_list(self) -> List[BasisSet]:
        return list(chain(*[n.basis_sets for n in self.node_list]))

    @property
    def dof_list(self) -> List[Any]:
        return list(chain(*[b.dofs for b in self.basis_list]))

    @property
    def basis_list_postorder(self) -> List[BasisSet]:
        return list(chain(*[n.basis_sets for n in self.postorder_list()]))

    @property
    def bond_dims(self) -> List[int]:
        for n in self.node_list:
            if n.bond_dim is None:
                raise ValueError(f"One of the bond dimensions is None: {n}")
        return [n.bond_dim for n in self.node_list]

    @property
    def pbond_dims(self) -> List[List[int]]:
        return [n.pbond_dims for n in self.node_list]

    def add_auxiliary_space(self, auxiliary_label="Q") -> "BasisTree":
        """Thermofield P/Q doubling: each physical basis gains an auxiliary
        copy with zero quantum numbers (reference ``treebase.py:378-395``)."""
        node2_list = []
        for node in self:
            basis2 = []
            for basis in node.basis_sets:
                basis2.append(basis)
                if not isinstance(basis, BasisDummy):
                    basis_q = basis.copy((auxiliary_label, basis.dofs))
                    basis_q.sigmaqn = np.zeros_like(basis.sigmaqn)
                    basis2.append(basis_q)
            node2_list.append(TreeNodeBasis(basis2))
        copy_connection(self.node_list, node2_list)
        return BasisTree(node2_list[0])


def print_as_tree(text_list, adj_matrix, print_function=print):
    """ASCII rendering of an arbitrary tree given node texts and an adjacency
    matrix (reference ``treebase.py:408-420``)."""
    import numpy as np

    adj = np.asarray(adj_matrix)
    n = len(text_list)
    children = {i: [] for i in range(n)}
    indeg = [0] * n
    for i in range(n):
        for j in range(n):
            if adj[i][j]:
                children[i].append(j)
                indeg[j] += 1
    roots = [i for i in range(n) if indeg[i] == 0]
    assert len(roots) == 1, "adjacency matrix must define a single-rooted tree"

    def recursion(idx, prefix, is_last):
        connector = "└── " if is_last else "├── "
        if prefix == "" and is_last and idx == roots[0]:
            print_function(str(text_list[idx]))
            child_prefix = ""
        else:
            print_function(prefix + connector + str(text_list[idx]))
            child_prefix = prefix + ("    " if is_last else "│   ")
        for k, c in enumerate(children[idx]):
            recursion(c, child_prefix, k == len(children[idx]) - 1)

    recursion(roots[0], "", True)
