"""Color-transfer solver suite (reference: source/ColorTransfer/)."""
