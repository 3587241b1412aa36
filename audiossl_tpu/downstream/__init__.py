"""Downstream evaluation suite (reference
``audiossl/methods/{atst,atstframe}/downstream/``): frozen linear
probing over cached embeddings, full finetuning with layer-wise lr
decay, metrics, and the task drivers.
"""
