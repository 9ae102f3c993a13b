from .base import Sketch, SketchError, sketch_from_bytes
from .bloom import BloomFilter
from .blockedbloom import BlockedBloomFilter
from .sbf import ScalableBloomFilter
from .cbloom import CountingBloomFilter
from .tdbloom import TimeDecayingBloomFilter
from .tdcbloom import TimeDecayingCountingBloomFilter
from .hll import HyperLogLog, SparseHLL
from .slidinghll import SlidingHyperLogLog
from .cms import ConservativeCountMinSketch, CountMinSketch
from .stablebloom import StableBloomFilter
from .tdigest import TDigest
from .kll import KLLSketch
from .req import ReqSketch
from .llf import LogLogFilter
from .gss import GroupSizeSampler
from .dyndist import DynamicDistinct
from .mg import MisraGries
from .ams import AMSSketch
from .kmv import KMVSketch
from .varopt import VarOptSampler
from .theta import ThetaSketch
from .cuckoo import CuckooFilter, ReferenceCuckooFilter
from .cuckoovariants import CountingCuckooFilter, TimeDecayingCuckooFilter
from .gaussiannb import GaussianNB
from .dd import DDSketch
from .xorf import BinaryFuseFilter, XorFilter, XorMap
from .qf import QuotientFilter, CountingQuotientFilter
from .fd import FrequentDirections
from .roaring import RoaringBitmap
from .dgim import DGIM

__all__ = [
    "Sketch",
    "SketchError",
    "sketch_from_bytes",
    "BloomFilter",
    "BlockedBloomFilter",
    "ScalableBloomFilter",
    "CountingBloomFilter",
    "TimeDecayingBloomFilter",
    "TimeDecayingCountingBloomFilter",
    "HyperLogLog",
    "SparseHLL",
    "SlidingHyperLogLog",
    "CountMinSketch",
    "ConservativeCountMinSketch",
    "StableBloomFilter",
    "TDigest",
    "KLLSketch",
    "ReqSketch",
    "LogLogFilter",
    "GroupSizeSampler",
    "DynamicDistinct",
    "MisraGries",
    "AMSSketch",
    "KMVSketch",
    "VarOptSampler",
    "ThetaSketch",
    "CuckooFilter",
    "ReferenceCuckooFilter",
    "CountingCuckooFilter",
    "TimeDecayingCuckooFilter",
    "GaussianNB",
    "DDSketch",
    "XorFilter",
    "XorMap",
    "BinaryFuseFilter",
    "QuotientFilter",
    "CountingQuotientFilter",
    "FrequentDirections",
    "RoaringBitmap",
    "DGIM",
]
