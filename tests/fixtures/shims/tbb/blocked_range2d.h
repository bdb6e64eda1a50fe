#pragma once
namespace tbb {
template <class R, class C = R>
struct blocked_range2d {};
}
