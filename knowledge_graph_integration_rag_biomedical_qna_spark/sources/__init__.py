"""Sources & sinks: transcripts/concepts readers, table writer abstraction."""
