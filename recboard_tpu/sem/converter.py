"""Semantic-ID protocol converter + trie.

Reference: TIGER/converter.py:71-465 — item keys ("item_3") ↔ SID
protocol text ("<SID> <sid_0_2> <sid_1_7> </SID>"), collision
resolution via an extra check token (<sid_c_k>, :417-449), and a prefix
trie driving constrained beam search (`allowed_tokens`, :329-371).

TPU-first deviation: the reference walks a Python trie per decoding
step through HF's `prefix_allowed_tokens_fn` (host callback). Here the
trie is compiled once into dense arrays —

    allowed  : (num_nodes, vocab) bool   — legal next tokens per node
    next_node: (num_nodes, vocab) int32  — transition table
    node_item: (num_nodes,)       int32  — item id at terminal nodes

— so constrained decoding is pure gather/where inside a jitted beam
search (SURVEY.md §7 hard part #6). The string protocol API is kept for
parity and offline tooling.

Token id layout: 0=PAD, 1=<SID>, 2=</SID>, 3..=sid/check tokens in
registration order.
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

__all__ = ["SemIDConverter", "SimpleTokenizer"]


class SimpleTokenizer:
    """Minimal added-token vocabulary (HF-tokenizer shaped).

    The three-method surface (add_tokens / convert_tokens_to_ids /
    __len__) is the protocol contract SemIDConverter targets — the same
    duck type the reference exercises in its doctest shim
    (TIGER/converter.py:84-97); a real HF tokenizer drops in for it."""

    def __init__(self, tokens: Sequence = ()):
        self._ids: Dict[str, int] = {}
        if tokens:
            self.add_tokens(tokens)

    def add_tokens(self, tokens) -> int:
        added = 0
        for token in map(str, tokens):
            if token not in self._ids:
                self._ids[token] = len(self._ids)
                added += 1
        return added

    def convert_tokens_to_ids(self, token: str) -> int:
        return self._ids[str(token)]

    @property
    def vocab(self) -> Dict[str, int]:
        return self._ids

    def __len__(self) -> int:
        return len(self._ids)


class SemIDConverter:
    """Item keys ↔ SID protocol text + dense trie tables.

    >>> conv = SemIDConverter({"item_3": ("<sid_0_2>",), "item_1": ("<sid_0_5>",)})
    >>> conv.encode("item_3")
    '<SID> <sid_0_2> </SID>'
    >>> conv.decode("prefix <SID><sid_0_2></SID> suffix")
    [3]
    >>> conv.decode("<SID><sid_0_9></SID>")  # unknown sids are skipped
    []
    >>> sorted(conv.item_ids())
    [1, 3]
    """

    ITEM_FORMAT = "{prefix}_{id}"
    SID_FORMAT = "<sid_{level}_{id}>"
    CHECK_SID_FORMAT = "<sid_c_{id}>"
    SID_START_TOKEN = "<SID>"
    SID_END_TOKEN = "</SID>"
    PAD_TOKEN = "<pad>"

    ITEM_PATTERN = re.compile(r"^(?P<prefix>[A-Za-z0-9_-]+)_(?P<id>0|[1-9][0-9]*)$")
    SID_CONTENT_PATTERN = re.compile(r"<sid_[0-9]+_[0-9]+>|<sid_c_[0-9]+>")
    SID_BLOCK_PATTERN = re.compile(r"<SID>(?P<body>.*?)</SID>", re.DOTALL)

    def __init__(
        self,
        sid_vocab: Dict[str, Tuple[str, ...]],
        tokenizer: Optional[SimpleTokenizer] = None,
    ):
        self.tokenizer = tokenizer if tokenizer is not None else SimpleTokenizer()
        sid_vocab = {k: tuple(v) for k, v in sid_vocab.items()}
        if self._has_collision(sid_vocab):
            sid_vocab = self.resolve_collision(sid_vocab)
        self._item_to_sids = sid_vocab
        self._sids_to_item = {sids: item for item, sids in sid_vocab.items()}
        self.max_num_sid_tokens = max(len(s) for s in self._sids_to_item)

        # register protocol tokens: pad, start, end, then sid tokens
        self.tokenizer.add_tokens([self.PAD_TOKEN])
        self.tokenizer.add_tokens([self.SID_START_TOKEN, self.SID_END_TOKEN])
        uniq = []
        seen = set()
        for sids in self._item_to_sids.values():
            for s in sids:
                if s not in seen:
                    seen.add(s)
                    uniq.append(s)
        self.tokenizer.add_tokens(uniq)
        self.pad_id = self.tokenizer.convert_tokens_to_ids(self.PAD_TOKEN)
        self.start_id = self.tokenizer.convert_tokens_to_ids(self.SID_START_TOKEN)
        self.end_id = self.tokenizer.convert_tokens_to_ids(self.SID_END_TOKEN)
        self.vocab_size = len(self.tokenizer)
        self._build_tables()

    # ------------------------------------------------------------ formats
    @classmethod
    def format(cls, item_id: int, prefix: str = "item") -> str:
        return cls.ITEM_FORMAT.format(prefix=prefix, id=item_id)

    @classmethod
    def parse(cls, item: str) -> Tuple[str, int]:
        m = cls.ITEM_PATTERN.match(item)
        if not m:
            raise ValueError(f"bad item key {item!r}")
        return m.group("prefix"), int(m.group("id"))

    @classmethod
    def from_codes(
        cls, codes: np.ndarray, prefix: str = "item"
    ) -> "SemIDConverter":
        """Build from (N, L) integer code matrix (quantizer output)."""
        vocab = {}
        for item_id, row in enumerate(np.asarray(codes)):
            vocab[cls.format(item_id, prefix)] = tuple(
                cls.SID_FORMAT.format(level=l, id=int(c)) for l, c in enumerate(row)
            )
        return cls(vocab)

    # --------------------------------------------------------- collisions
    @staticmethod
    def _has_collision(sid_vocab: Dict[str, Tuple[str, ...]]) -> bool:
        return len({v for v in sid_vocab.values()}) < len(sid_vocab)

    @classmethod
    def resolve_collision(
        cls, sid_vocab: Dict[str, Tuple[str, ...]]
    ) -> Dict[str, Tuple[str, ...]]:
        """Append a check token to every member of a colliding group
        (TIGER/converter.py:417-449)."""
        groups: Dict[Tuple[str, ...], List[str]] = {}
        for item, sids in sid_vocab.items():
            groups.setdefault(sids, []).append(item)
        resolved: Dict[str, Tuple[str, ...]] = {}
        for sids, items in groups.items():
            if len(items) == 1:
                resolved[items[0]] = sids
            else:
                for check_id, item in enumerate(items):
                    resolved[item] = sids + (
                        cls.CHECK_SID_FORMAT.format(id=check_id),
                    )
        return resolved

    @property
    def sid_vocab(self) -> Dict[str, Tuple[str, ...]]:
        return dict(self._item_to_sids)

    def item_ids(self) -> List[int]:
        return [self.parse(k)[1] for k in self._item_to_sids]

    @property
    def collision_rate(self) -> float:
        checked = sum(
            1
            for sids in self._item_to_sids.values()
            if sids and sids[-1].startswith("<sid_c_")
        )
        return checked / max(len(self._item_to_sids), 1)

    # ------------------------------------------------------------ strings
    def encode(self, items: Union[str, List[str]]) -> str:
        if isinstance(items, str):
            items = [items]
        blocks = []
        for item in items:
            sids = self._item_to_sids[item]
            blocks.append(
                " ".join([self.SID_START_TOKEN, *sids, self.SID_END_TOKEN])
            )
        return " ".join(blocks)

    def batch_encode(self, batch_items: List[List[str]]) -> List[str]:
        return [self.encode(items) for items in batch_items]

    def decode(self, text: str, *, prefix: str = "item") -> List[int]:
        out = []
        for m in self.SID_BLOCK_PATTERN.finditer(text):
            sids = tuple(self.SID_CONTENT_PATTERN.findall(m.group("body")))
            item = self._sids_to_item.get(sids)
            if item is not None:
                p, i = self.parse(item)
                if p == prefix:
                    out.append(i)
        return out

    def batch_decode(self, texts: List[str], *, prefix: str = "item") -> List[List[int]]:
        return [self.decode(t, prefix=prefix) for t in texts]

    # -------------------------------------------------------------- trie
    def _build_tables(self) -> None:
        """Dense trie: node 0 = root (expects <SID>), node 1 = in-block
        start; terminals record item ids after consuming </SID>."""
        tok = self.tokenizer.convert_tokens_to_ids
        # token sequence per item: [<SID>, sids..., </SID>]
        seqs = {
            item: [self.start_id, *[tok(s) for s in sids], self.end_id]
            for item, sids in self._item_to_sids.items()
        }
        children: List[Dict[int, int]] = [dict()]
        node_item = [-1]

        def child(node: int, token: int) -> int:
            nxt = children[node].get(token)
            if nxt is None:
                children.append(dict())
                node_item.append(-1)
                nxt = len(children) - 1
                children[node][token] = nxt
            return nxt

        for item, seq in seqs.items():
            node = 0
            for t in seq:
                node = child(node, t)
            node_item[node] = self.parse(item)[1]

        V = self.vocab_size
        n = len(children)
        # fail FAST on degenerate vocabs: a collapsed tokenizer (the
        # r5 R3-VAE stage-A at 40 epochs: 99.9% collisions) pushes
        # thousands of check tokens into the vocab and the dense trie
        # grows to n_nodes x vocab GBs — which then dies opaquely in
        # the compiler upload (HTTP 413 over the axon tunnel). 200 MB
        # of trie means the tokenizer is broken, not the trie.
        est = n * V * (np.dtype(np.int32).itemsize + 1)
        if est > 200 * 1024 * 1024:
            raise ValueError(
                f"dense SID trie would be {est / 1e9:.2f} GB "
                f"({n} nodes x {V} tokens) — the tokenizer is "
                f"degenerate (collision rate "
                f"{self.collision_rate:.3f}). Train stage A to PPL "
                "convergence (the reference runs 10k epochs with "
                "early stopping) before building the generator."
            )
        allowed = np.zeros((n, V), dtype=bool)
        next_node = np.full((n, V), -1, dtype=np.int32)
        for i, kids in enumerate(children):
            for t, j in kids.items():
                allowed[i, t] = True
                next_node[i, t] = j
        # terminal nodes may only emit PAD (self-loop) once a block is done
        for i in range(n):
            if node_item[i] >= 0:
                allowed[i, self.pad_id] = True
                next_node[i, self.pad_id] = i
        self.allowed = allowed
        self.next_node = next_node
        self.node_item = np.asarray(node_item, dtype=np.int32)

        # per-item fixed-length token ids, PAD-filled (the TPU hot path)
        L = self.max_num_sid_tokens + 2
        n_items = max(self.item_ids()) + 1
        table = np.full((n_items, L), self.pad_id, dtype=np.int32)
        lengths = np.zeros(n_items, dtype=np.int32)
        for item, seq in seqs.items():
            i = self.parse(item)[1]
            table[i, : len(seq)] = seq
            lengths[i] = len(seq)
        self.item_token_ids = table
        self.item_token_lengths = lengths

    def allowed_tokens(self, generated: Sequence[int]) -> Tuple[int, ...]:
        """Python-trie parity API (TIGER/converter.py:329-371): legal
        next tokens after the generated suffix since the last block."""
        node = 0
        for t in generated:
            nxt = int(self.next_node[node, t]) if t < self.vocab_size else -1
            node = nxt if nxt >= 0 else 0
        return tuple(int(t) for t in np.flatnonzero(self.allowed[node]))

    # --------------------------------------------------------------- io
    def save(self, file_: str) -> None:
        # atomic rename: concurrent sweep processes may race to produce
        # the same shared vocab; a reader must never see a partial json
        tmp = f"{file_}.tmp{os.getpid()}"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump({k: list(v) for k, v in self._item_to_sids.items()}, fh)
        os.replace(tmp, file_)

    @classmethod
    def load(cls, file_: str) -> "SemIDConverter":
        with open(file_, encoding="utf-8") as fh:
            vocab = json.load(fh)
        return cls({k: tuple(v) for k, v in vocab.items()})
