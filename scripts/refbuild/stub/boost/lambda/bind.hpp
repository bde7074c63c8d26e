// Minimal boost::lambda for the scratch parity build: just enough for
// the reference's predicate expressions — bind(f, args...) with the _1
// placeholder, value/cref/pointer captures, and composition with
// !, &&, || and + (FilterGraph.cc:414, Overlap.cpp:458,
// PopBubbles.cpp:265-291).  Clean-room, C++17 generic lambdas inside.
#ifndef STUB_BOOST_LAMBDA_BIND
#define STUB_BOOST_LAMBDA_BIND 1
#include <functional>
#include <utility>

namespace boost {
using std::cref;
using std::ref;

namespace lambda {

struct placeholder1_t {};
namespace {
constexpr placeholder1_t _1{};
}

template <class F>
struct lx {
	F f;
	template <class A>
	auto operator()(A&& a) const { return f(std::forward<A>(a)); }
};
template <class F>
lx<F> make_lx(F f) { return lx<F>{std::move(f)}; }

// argument resolution at call time
template <class A>
decltype(auto) resolve(placeholder1_t, A&& a) { return std::forward<A>(a); }
template <class T, class A>
T& resolve(std::reference_wrapper<T> r, A&&) { return r.get(); }
template <class F, class A>
decltype(auto) resolve(const lx<F>& e, A&& a) { return e(std::forward<A>(a)); }
template <class T, class A>
T& resolve(T& v, A&&) { return v; }
template <class T, class A>
const T& resolve(const T& v, A&&) { return v; }

template <class F, class... Bs>
auto bind(F f, Bs... bs)
{
	return make_lx([f, bs...](auto&& a) {
		return std::invoke(f, resolve(bs, a)...);
	});
}

template <class F>
auto operator!(const lx<F>& e)
{
	return make_lx([e](auto&& a) { return !e(a); });
}
template <class F, class G>
auto operator&&(const lx<F>& e1, const lx<G>& e2)
{
	return make_lx([e1, e2](auto&& a) { return e1(a) && e2(a); });
}
template <class F, class G>
auto operator||(const lx<F>& e1, const lx<G>& e2)
{
	return make_lx([e1, e2](auto&& a) { return e1(a) || e2(a); });
}
template <class F, class G>
auto operator+(const lx<F>& e1, const lx<G>& e2)
{
	return make_lx([e1, e2](auto&& a) { return e1(a) + e2(a); });
}

// var/constant captures
template <class T>
auto var(T& v) { return make_lx([&v](auto&&) -> T& { return v; }); }

} // namespace lambda
} // namespace boost
#endif
