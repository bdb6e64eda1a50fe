#pragma once
#include <functional>
#include <unordered_set>

namespace tbb {
template <class K, class Hash = std::hash<K>, class Eq = std::equal_to<K>>
using concurrent_unordered_set = std::unordered_set<K, Hash, Eq>;
}
