"""Generic zoo runner: ``python -m recboard_tpu.run --model SASRec
--dataset Amazon2014Beauty_550_LOU --config configs/x.yaml``.

The reference ships one main.py per model dir (CONTRIBUTING.md layout);
here every zoo model also registers enough metadata to be launched from
a single CLI. Per-model extra hyperparameters pass through the YAML
config / CLI unchanged (the Parser keeps unknown keys).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

from . import utils
from .data.datasets import NextItemRecDataSet, PredictionRecDataSet, RecDataSet
from .data.tags import TaskTag
from .launcher import Coach
from .models.zoo import REGISTRY
from .parser import Parser


def model_field_names(cls) -> set:
    return {f.name for f in dataclasses.fields(cls) if f.name != "dataset"}


def build_model(name: str, dataset: RecDataSet, cfg: Dict[str, Any]):
    if name not in REGISTRY:
        raise SystemExit(
            f"unknown model {name!r}; available: {', '.join(sorted(REGISTRY))}"
        )
    cls = REGISTRY[name]
    from .models.base import PredRecArch

    if issubclass(cls, PredRecArch) and dataset.tasktag != TaskTag.PREDICTION:
        raise SystemExit(
            f"model {name!r} is a CTR/prediction model: run it with "
            "--tasktag PREDICTION on a prediction dataset plus a YAML "
            "`fields:` schema (see configs/ and DeepFM/README.md semantics)"
        )
    fields = model_field_names(cls)
    kwargs = {k: cfg[k] for k in fields if k in cfg and cfg[k] is not None}
    # the reference's stage-A configs spell the codebook k-means init
    # `kmeans_init` (ETEGRec/configs/rqvae); RQVAE's field uses LETTER's
    # name `apply_kmeans_init` — alias so config-driven stage-A runs
    # don't silently drop the init (a collapse risk, docs/PARITY.md)
    if ("apply_kmeans_init" in fields and "apply_kmeans_init" not in kwargs
            and cfg.get("kmeans_init") is not None):
        kwargs["apply_kmeans_init"] = cfg["kmeans_init"]
    # reference configs write sequence hyperparameters as comma strings
    # parsed by cfg.<k>.split(",") (DeepFM/main.py:283 style:
    # "400,400,400", sk_epsilons "0.,0.,0.003") — coerce them to the
    # tuple type the dataclass field declares, element type taken from
    # the field's default
    defaults = {f.name: f.default for f in dataclasses.fields(cls)}
    for k, v in list(kwargs.items()):
        d = defaults.get(k)
        if isinstance(v, str) and isinstance(d, (tuple, list)):
            elem = type(d[0]) if len(d) else float
            kwargs[k] = tuple(elem(x) for x in v.split(",") if x != "")
        elif isinstance(v, str) and d is None and "," in v:
            # Optional sequence fields (sk_epsilons: "0.,0.,0.03") have
            # no default to take the element type from — numeric commas
            # coerce to a float tuple ("0." parses as 0.0)
            parts = [x for x in v.split(",") if x != ""]
            try:
                kwargs[k] = tuple(float(x) for x in parts)
            except ValueError:
                pass  # a genuine comma-bearing string stays a string
    if "adj" in fields and "adj" not in kwargs:
        if hasattr(cls, "build_adj"):
            kwargs["adj"] = cls.build_adj(dataset)
        else:
            kwargs["adj"] = dataset.train().to_normalized_adj("sym")

    # modality / side-information construction (reference: --vfile/--tfile
    # pickles under the dataset dir, FREEDOM/main.py:92-101)
    import os

    from . import utils as _utils

    def load_feat(key):
        file_ = cfg.get(key)
        if not file_:
            return None
        path = os.path.join(dataset.path, file_)
        if not os.path.isfile(path):
            raise SystemExit(
                f"model {name!r} needs the modality feature pickle "
                f"{file_!r} under {dataset.path} (encode it as the "
                "reference does: encode_amazon2023_context.ipynb / "
                "<Model>/encode_textual_features.py, or pass "
                f"--{key} '' to drop this modality)"
            )
        feats = _utils.import_pickle(path)
        import numpy as _np

        return _np.asarray(feats, dtype=_np.float32)

    vfeats = load_feat("vfile") if "vfeats" in fields else None
    tfeats = load_feat("tfile") if "tfeats" in fields else None
    if "vfeats" in fields:
        kwargs.setdefault("vfeats", vfeats)
    if "tfeats" in fields:
        kwargs.setdefault("tfeats", tfeats)
    knn_k = int(cfg.get("knn_k", 10) or 10)
    if "m_knn" in fields and (vfeats is not None or tfeats is not None):
        kwargs.setdefault(
            "m_knn",
            cls.build_m_knn(vfeats, tfeats, knn_k, float(cfg.get("weight4mAdj", 0.1))),
        )
    if "v_knn" in fields and vfeats is not None:
        from .models.zoo.multimodal import knn_graph_np

        kwargs.setdefault("v_knn", knn_graph_np(vfeats, knn_k))
    if "t_knn" in fields and tfeats is not None:
        from .models.zoo.multimodal import knn_graph_np

        kwargs.setdefault("t_knn", knn_graph_np(tfeats, knn_k))
    if "v_origin" in fields and vfeats is not None:
        from .models.zoo.multimodal import knn_graph_np

        kwargs.setdefault("v_origin", knn_graph_np(vfeats, knn_k))
    if "t_origin" in fields and tfeats is not None:
        from .models.zoo.multimodal import knn_graph_np

        kwargs.setdefault("t_origin", knn_graph_np(tfeats, knn_k))
    if "r_adj" in fields and hasattr(cls, "build_r_adj"):
        kwargs.setdefault("r_adj", cls.build_r_adj(dataset))
    if "user_beta" in fields and hasattr(cls, "build_side_info"):
        ub, ib, iiw, iii = cls.build_side_info(
            dataset, num_neighbors=int(cfg.get("num_neighbors", 10) or 10)
        )
        kwargs.setdefault("user_beta", ub)
        kwargs.setdefault("item_beta", ib)
        kwargs.setdefault("ii_weights", iiw)
        kwargs.setdefault("ii_indices", iii)
    if "item_features" in fields:
        feats = load_feat("tfile")
        if feats is None:
            feats = load_feat("vfile")
        if feats is None:
            # generative tokenizers name their feature pickle
            # sem_feat_file (TIGER/configs/rqvae/*.yaml)
            feats = load_feat("sem_feat_file")
        if feats is not None:
            if hasattr(cls, "build_features"):  # AlphaRec: + user means
                item_f, user_f = cls.build_features(dataset, feats)
                kwargs.setdefault("item_features", item_f)
                kwargs.setdefault("user_features_arr", user_f)
            else:
                kwargs.setdefault("item_features", feats)
    if "collab_features" in fields and kwargs.get("collab_features") is None:
        collab = load_feat("collab_feat_file")
        if collab is not None:
            kwargs.setdefault("collab_features", collab)
    if "converter" in fields and kwargs.get("converter") is None:
        # stage-B generators load the tokenizer stage's vocab directly
        # (TIGER/configs/t5/*.yaml `sid_vocab_file`)
        vocab_file = cfg.get("sid_vocab_file")
        if vocab_file:
            from .sem.converter import SemIDConverter

            path = (
                vocab_file
                if os.path.isabs(vocab_file) or os.path.isfile(vocab_file)
                else os.path.join(dataset.path, vocab_file)
            )
            if os.path.isfile(path):
                kwargs["converter"] = SemIDConverter.load(path)
            else:
                raise SystemExit(
                    f"model {name!r}: sid_vocab_file {vocab_file!r} not "
                    "found (run the tokenizer stage first — "
                    "examples/tiger_pipeline.py or `run --model RQVAE`)"
                )
    if "sem_codes" in fields and kwargs.get("sem_codes") is None:
        codes_file = cfg.get("sem_codes_file")
        if codes_file:
            path = (
                codes_file if os.path.isfile(codes_file)
                else os.path.join(dataset.path, codes_file)
            )
            import numpy as _np

            kwargs["sem_codes"] = _np.asarray(
                _utils.import_pickle(path), dtype=_np.int64
            )
    if "text_features" in fields and kwargs.get("text_features") is None:
        feats = load_feat("tfile")
        if feats is not None:
            if feats.ndim == 2:  # (N, D) → one text field (N, 1, D)
                feats = feats[:, None, :]
            kwargs["text_features"] = feats
    if "datasets" in fields and kwargs.get("datasets") is None:
        # single-corpus launch (UniSRec pretrained on ONE dataset):
        # the dict degenerates to {name: this dataset}; multi-corpus
        # runs still go through a driving script
        feats = load_feat("tfile")
        if feats is not None:
            kwargs["datasets"] = {cfg.dataset: dataset}
            if "tfeats" in fields:
                # override: the generic modality block above sets tfeats
                # to the raw array; UniSRec wants the per-dataset dict
                kwargs["tfeats"] = {cfg.dataset: feats}

    # models that require side inputs the generic CLI cannot derive
    hard_required = {
        "datasets": "a dict of datasets (multi-dataset model — drive via a script)",
        "item_features": "an item-feature pickle (--tfile, --vfile or "
                         "--sem_feat_file)",
        "sem_codes": "semantic-id codes (run the tokenizer stage first)",
        "converter": "a SemIDConverter (run the tokenizer stage first)",
    }
    blocking = [
        f"{field_name}: needs {why}"
        for field_name, why in hard_required.items()
        if field_name in fields and kwargs.get(field_name) is None
    ]
    if getattr(cls, "REQUIRES_MODALITY", False) and all(
        kwargs.get(k) is None
        for k in ("vfeats", "tfeats", "m_knn", "v_knn", "t_knn")
        if k in fields
    ):
        blocking.append(
            "vfeats/tfeats: needs at least one modality-feature pickle "
            "(--vfile/--tfile pointing into the dataset dir)"
        )
    if blocking:
        raise SystemExit(
            f"model {name!r} needs inputs the generic runner was not given:\n  "
            + "\n  ".join(blocking)
            + "\nSee the model's docstring for the full pipeline."
        )
    return cls(dataset, **kwargs)


def build_pipes(model, cfg):
    import inspect

    from .models.base import GenRecArch, SeqRecArch

    if not hasattr(type(model), "sure_validpipe"):
        # tokenizer-stage models (RQVAE/LETTER/R3-VAE): their Coach
        # evaluates codebook metrics from params, no eval pipes
        return model.sure_trainpipe(int(cfg.batch_size)), None, None
    sig = inspect.signature(model.sure_trainpipe)
    seq_style = "maxlen" in sig.parameters
    if seq_style:
        trainpipe = model.sure_trainpipe(int(cfg.maxlen), int(cfg.batch_size))
        validpipe = model.sure_validpipe(int(cfg.maxlen), ranking=cfg.ranking)
        testpipe = model.sure_testpipe(int(cfg.maxlen), ranking=cfg.ranking)
    else:
        trainpipe = model.sure_trainpipe(int(cfg.batch_size))
        validpipe = model.sure_validpipe(cfg.ranking)
        testpipe = model.sure_testpipe(cfg.ranking)

    if cfg.get("on_device_sampling"):
        from .data.device import (
            DeviceFullSeqSampler,
            DeviceGenSampler,
            DevicePairSampler,
            DeviceRollSeqSampler,
            DeviceSeqSampler,
        )
        from .models.zoo.tiger import TIGER as _TIGER

        # only for models whose trainpipe follows the standard window /
        # choiced-user protocols (others keep the generator pipes)
        if isinstance(model, _TIGER):
            # roll-window pipe, item.count-padded, no id offset
            trainpipe = DeviceRollSeqSampler(
                model.dataset,
                maxlen=int(cfg.maxlen),
                batch_size=int(cfg.batch_size),
                num_pads=0,
                pad_value=model.Item.count,
            )
        elif type(model).__name__ in ("SASRec", "STOSA", "SEvo"):
            trainpipe = DeviceSeqSampler(
                model.dataset,
                maxlen=int(cfg.maxlen),
                batch_size=int(cfg.batch_size),
                num_pads=model.NUM_PADS,
            )
        elif type(model).__name__ == "HSTU":
            from .data.device import DeviceTimeSeqSampler

            # time-aware windows (HSTU/sampler.py); negatives are drawn
            # in-model from the sampling rng stream
            trainpipe = DeviceTimeSeqSampler(
                model.dataset,
                maxlen=int(cfg.maxlen),
                batch_size=int(cfg.batch_size),
                num_pads=model.NUM_PADS,
            )
        elif getattr(model, "ZOO_NAME", None) == "Caser":
            # Caser windows (Caser/main.py:35 + sure_trainpipe): the
            # roll window caps at maxlen+num_poss, its last num_poss
            # items are the positives, num_negs gen_-style negatives
            trainpipe = DeviceRollSeqSampler(
                model.dataset,
                maxlen=int(cfg.maxlen),
                batch_size=int(cfg.batch_size),
                minlen=int(model.num_poss) + 1,
                num_pads=model.NUM_PADS,
                pad_value=model.PADDING_VALUE,
                num_negatives=int(model.num_negs),
                num_positives=int(model.num_poss),
                keep_at_least_itself=False,
            )
        elif getattr(model, "ZOO_NAME", None) in (
            "STAMP", "FMLP-Rec", "BSARec", "FPMC",  # roll source capped
            "GRU4Rec", "NARM", "GLINT-RU",          # lprune_ after yield
        ):
            rpad = model.ZOO_NAME in ("GRU4Rec", "NARM", "GLINT-RU")
            trainpipe = DeviceRollSeqSampler(
                model.dataset,
                maxlen=int(cfg.maxlen),
                batch_size=int(cfg.batch_size),
                num_pads=model.NUM_PADS,
                pad_value=model.PADDING_VALUE,
                num_negatives=1,
                pad_side="right" if rpad else "left",
                window_includes_target=not rpad,
            )
        elif getattr(model, "ZOO_NAME", None) in ("ETEGRec", "DIGER"):
            from .data.device import DeviceLastTargetSampler

            # per-user last-target windows with OFFSET IPos
            # (etegrec.py sure_trainpipe); ETEGRecCoach draws per-step
            # batches from it and attaches the current item_code
            trainpipe = DeviceLastTargetSampler(
                model.dataset,
                maxlen=int(cfg.maxlen),
                batch_size=int(cfg.batch_size),
                num_pads=model.NUM_PADS,
            )
        elif getattr(model, "ZOO_NAME", None) == "LESSR":
            # roll windows, lprune_ then lpad_ (LESSR trainpipe); the
            # session graphs are derived IN-JIT from ISeq
            # (lessr.derive_session_graphs) — no host graph builder
            trainpipe = DeviceRollSeqSampler(
                model.dataset,
                maxlen=int(cfg.maxlen),
                batch_size=int(cfg.batch_size),
                num_pads=model.NUM_PADS,
                pad_value=model.PADDING_VALUE,
                pad_side="left",
                window_includes_target=False,
            )
        elif getattr(model, "ZOO_NAME", None) == "BERT4Rec":
            # masking is drawn in-model from the "sampling" stream
            trainpipe = DeviceFullSeqSampler(
                model.dataset,
                maxlen=int(cfg.maxlen),
                batch_size=int(cfg.batch_size),
                num_pads=model.NUM_PADS,
            )
        elif getattr(model, "ZOO_NAME", None) == "RUM":
            trainpipe = DeviceFullSeqSampler(
                model.dataset,
                maxlen=int(cfg.maxlen),
                batch_size=int(cfg.batch_size),
                num_pads=model.NUM_PADS,
                sample_pos=True,
                num_negatives=1,
            )
        elif getattr(model, "ZOO_NAME", None) in ("SimpleX", "UltraGCN"):
            # pairs-source protocol: users weighted by activity; the
            # models sample their own negatives when unseen_only=False
            trainpipe = DevicePairSampler(
                model.dataset,
                batch_size=int(cfg.batch_size),
                num_negatives=(
                    int(getattr(model, "num_negs", 1))
                    if getattr(model, "unseen_only", True)
                    else 0
                ),
            )
        elif isinstance(model, GenRecArch):
            trainpipe = DeviceGenSampler(
                model.dataset, batch_size=int(cfg.batch_size)
            )
        else:
            from . import utils

            utils.warnLogger(
                f"[run] >>> on_device_sampling unsupported for "
                f"{type(model).__name__}; using generator pipes"
            )
    return trainpipe, validpipe, testpipe


def load_dataset(cfg) -> RecDataSet:
    tag = TaskTag(cfg.get("tasktag", "NEXTITEM"))
    if tag == TaskTag.PREDICTION:
        return PredictionRecDataSet(
            cfg.root, cfg.dataset, tasktag=tag, cfg=cfg.get("fields")
        )
    if tag == TaskTag.NEXTITEM:
        return NextItemRecDataSet(cfg.root, cfg.dataset, tasktag=tag)
    return RecDataSet(cfg.root, cfg.dataset, tasktag=tag)


def main(argv: Optional[list] = None):
    import sys

    argv = list(sys.argv[1:] if argv is None else argv)
    # default description = model name, decided BEFORE compile so
    # LOG_PATH/CHECKPOINT_PATH are derived from it
    if not any(a.startswith("--description") for a in argv):
        model_name = "SASRec"
        for i, a in enumerate(argv):  # YAML first, CLI overrides
            if a == "--config" and i + 1 < len(argv):
                import yaml as _yaml

                try:
                    with open(argv[i + 1]) as fh:
                        model_name = (_yaml.safe_load(fh) or {}).get(
                            "model", model_name
                        )
                except OSError:
                    pass
        for i, a in enumerate(argv):
            if a == "--model" and i + 1 < len(argv):
                model_name = argv[i + 1]
            elif a.startswith("--model="):
                model_name = a.split("=", 1)[1]
        argv += ["--description", model_name]

    parser = Parser()
    parser.add_argument("--model", type=str, default="SASRec")
    parser.add_argument("--maxlen", type=int, default=50)
    # default None: a generic CLI default here would silently override a
    # model's own dataclass default (STAMP requires hidden_size ==
    # embedding_dim, exactly like the reference STAMP/main.py:64-65 —
    # a blanket 128 broke it); only explicit values flow through
    parser.add_argument("--embedding-dim", type=int, default=None)
    parser.add_argument("--num-heads", type=int, default=None)
    parser.add_argument("--num-blocks", type=int, default=None)
    parser.add_argument("--num-layers", type=int, default=None)
    parser.add_argument("--hidden-size", type=int, default=None)
    parser.add_argument("--dropout-rate", type=float, default=None)
    parser.add_argument("--loss", type=str, default=None)
    parser.add_argument("--vfile", type=str, default=None)
    parser.add_argument("--tfile", type=str, default=None)
    parser.add_argument("--knn-k", type=int, default=10)
    cfg = parser.compile(argv)
    if not cfg.get("description") or cfg.description == "RecBoardTPU":
        cfg.description = cfg.model

    dataset = load_dataset(cfg)
    dataset.summary()
    model = build_model(cfg.model, dataset, cfg)
    # models with an internal weight_decay field fold it into the loss
    # (LightGCN-family: CoachFor*.set_optimizer comments decay out,
    # LightGCN/main.py:131-154) — zero the optimizer-side decay
    if "weight_decay" in model_field_names(type(model)):
        cfg.weight_decay = 0.0
    supported = getattr(type(model), "SUPPORTED_RANKINGS", ("full", "pool"))
    if cfg.ranking not in supported:
        utils.warnLogger(
            f"[run] >>> {cfg.model} does not support ranking={cfg.ranking!r} "
            f"(reference raises NotImplementedError); using {supported[0]!r}"
        )
        cfg.ranking = supported[0]
    trainpipe, validpipe, testpipe = build_pipes(model, cfg)
    # models whose novelty lives in the TRAINER (SEvo's smoothing
    # optimizer, ETEGRec/DIGER's alternating cycles) declare their
    # Coach subclass; everything else gets the base Coach
    coach_cls = getattr(type(model), "COACH", Coach)
    coach = coach_cls(
        dataset=dataset,
        trainpipe=trainpipe,
        validpipe=validpipe,
        testpipe=testpipe,
        model=model,
        cfg=cfg,
    )
    best = coach.fit()
    if hasattr(coach, "save_sid_vocab"):
        # tokenizer runs emit the SID vocab for stage B
        # (CoachForRQVAE.save_sid_vocab)
        vocab = coach.save_sid_vocab()
        utils.infoLogger(f"[run] >>> sid vocab: {vocab}")
    utils.infoLogger(f"[run] >>> best: {best}")
    return best


if __name__ == "__main__":
    main()
