from ..pipes import (  # noqa: F401
    GenTrainNegativeSampler,
    GenTrainPositiveSampler,
    SeqTrainNegativeSampler,
    SeqTrainPositiveYielder,
    TestSampler,
    ValidSampler,
)
