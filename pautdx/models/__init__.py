"""pautdx model families: signal (A-scan sequences) and vision (B-scan images)."""
