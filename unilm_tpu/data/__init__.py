"""L3 data layer: checkpointable host-side streaming + preprocessing.

Equivalent of kosmos-2/infinibatch (iterator algebra with getstate/setstate),
beit/{datasets,transforms,masking_generator}.py and fairseq/data essentials.
"""
