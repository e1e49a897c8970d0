"""Sources & sinks: seed readers, the deterministic synthetic web
(hermetic fetch oracle), image payload codec, snapshot catalog."""
