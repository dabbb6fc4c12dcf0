from icl.testing.synth import SynthConfig, generate_dataset

__all__ = ["SynthConfig", "generate_dataset"]
