"""Large-scale training-data operations (first-class engine components):
deduplication, similarity search, text analysis — all DataFrame-native,
designed for the 100 TB path (bounded shuffles, no driver-side loops)."""
