from semi_pd_tpu.constrained.grammar import GrammarCompiler, GrammarMatcher

__all__ = ["GrammarCompiler", "GrammarMatcher"]
