from .batch_engine import BatchEngine, Slot, SlotState
