from .synth_source import SynthCorpusDataSource, register_synth_source

__all__ = ["SynthCorpusDataSource", "register_synth_source"]
