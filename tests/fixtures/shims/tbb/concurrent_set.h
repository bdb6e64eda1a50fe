#pragma once
#include <functional>
#include <set>

namespace tbb {
template <class K, class Compare = std::less<K>>
using concurrent_set = std::set<K, Compare>;
}
