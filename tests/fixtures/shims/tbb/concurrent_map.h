#pragma once
#include <functional>
#include <map>

namespace tbb {
template <class Key, class T, class Compare = std::less<Key>>
using concurrent_map = std::map<Key, T, Compare>;
}
